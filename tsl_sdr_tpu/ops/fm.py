"""FM quadrature discriminator.

Reference behavior (``multifm/fm_demod.c:36-83``): per sample,
``s = a[n] * conj(a[n-1])`` in int32, then ``phi = fast_atan2f(s_im, s_re)``
and ``pcm[n] = (int16)((phi / pi) * 2^14)`` (C truncating cast).

TPU redesign: the one-sample history is a tiny state carry; the conjugate
product and LUT atan vectorize across the whole block on the VPU. Output is
int16 PCM in both tiers (the decoders consume int16); the ``exact`` flag only
controls the upstream arithmetic, the discriminator itself is float32 with a
worst-case +/-1 LSB divergence from the C double-promoted scaling (messages
are unaffected; see tests/test_fm.py).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from tsl_sdr_tpu.ops import q14
from tsl_sdr_tpu.ops.atan2 import fast_atan2, fast_atan2_np

_PI_F32 = np.float32(np.pi)


class FmDemodState(NamedTuple):
    last: jnp.ndarray  # [..., 2] int32 — previous IQ sample (0 at stream start)


def init_fm_state(batch_shape=()) -> FmDemodState:
    return FmDemodState(last=jnp.zeros(batch_shape + (2,), dtype=jnp.int32))


def fm_demod_step(state: FmDemodState, block):
    """block: [..., N, 2] int Q.14 IQ -> ([..., N] int16 PCM, new state).

    Leading batch dims (e.g. channels) broadcast; history is per-batch.
    """
    block = jnp.asarray(block)
    if jnp.issubdtype(block.dtype, jnp.floating):
        # fast tier: IQ arrives as float32 in sample units; the conj product
        # and angle stay float (only the angle matters to the discriminator)
        a = block.astype(jnp.float32)
        prev_f = jnp.concatenate(
            [state.last.astype(jnp.float32)[..., None, :], a[..., :-1, :]], axis=-2
        )
        s_re = a[..., 0] * prev_f[..., 0] + a[..., 1] * prev_f[..., 1]
        s_im = a[..., 1] * prev_f[..., 0] - a[..., 0] * prev_f[..., 1]
        phi = fast_atan2(s_im, s_re)
        scaled = (phi / _PI_F32) * jnp.float32(q14.Q14_ONE)
        pcm = jnp.trunc(scaled).astype(jnp.int16)
        return FmDemodState(last=jnp.round(a[..., -1, :]).astype(jnp.int32)), pcm
    a = block.astype(jnp.int32)
    prev = jnp.concatenate([state.last[..., None, :], a[..., :-1, :]], axis=-2)
    # s = a * conj(prev):
    s_re = a[..., 0] * prev[..., 0] + a[..., 1] * prev[..., 1]
    s_im = a[..., 1] * prev[..., 0] - a[..., 0] * prev[..., 1]
    phi = fast_atan2(s_im.astype(jnp.float32), s_re.astype(jnp.float32))
    scaled = (phi / _PI_F32) * jnp.float32(q14.Q14_ONE)
    pcm = jnp.trunc(scaled).astype(jnp.int16)
    return FmDemodState(last=a[..., -1, :]), pcm


def fm_demod_np(block, last=None):
    """Bit-exact host oracle with C float/double promotion semantics."""
    a = np.asarray(block).astype(np.int32)
    if last is None:
        last = np.zeros(a.shape[:-2] + (2,), dtype=np.int32)
    prev = np.concatenate([last[..., None, :], a[..., :-1, :]], axis=-2)
    s_re = a[..., 0] * prev[..., 0] + a[..., 1] * prev[..., 1]
    s_im = a[..., 1] * prev[..., 0] - a[..., 0] * prev[..., 1]
    phi = fast_atan2_np(s_im.astype(np.float32), s_re.astype(np.float32))
    # C: (phi / M_PI) * to_q15 — evaluated in double, stored to float.
    scaled = ((phi.astype(np.float64) / np.pi) * float(q14.Q14_ONE)).astype(
        np.float32
    )
    return np.trunc(scaled).astype(np.int16), a[..., -1, :]
