"""Sharded multifm: channelize + FM demod over a (time, channels) mesh.

Fast (float32) tier. The wideband capture splits into contiguous equal
segments on the ``time`` axis; the channel bank's taps/oscillators split on
the ``channels`` axis. Each time shard needs a halo of
``H = carry_len + D`` trailing input samples from its left neighbor — the
FIR's overlap-save tail plus one extra decimated output to seed the FM
discriminator's one-sample history — exchanged with a single
``jax.lax.ppermute`` over ICI before the dense compute.

The exact (integer) tier shards over channels only: its iterated Q.14
rotator is serial in time by construction (that drift IS the reference
semantics), so time sharding applies to the drift-free fast tier.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from tsl_sdr_tpu.ops.atan2 import fast_atan2
from tsl_sdr_tpu.ops import q14
from tsl_sdr_tpu.parallel.mesh import CHANNEL_AXIS, TIME_AXIS

_PI_F32 = np.float32(np.pi)


def _local_channelize_fm(iq_local, taps, omega, *, decimation, halo_len):
    """Per-shard kernel: [N,2] int16 + halo exchange -> [C_local, N//D] int16.

    Runs inside shard_map; iq_local is this time shard's segment.
    """
    n = iq_local.shape[0]
    d = decimation
    k_local = n // d
    nr_taps = taps.shape[1]
    nr_ch = taps.shape[0]

    # --- halo exchange over ICI: my tail -> right neighbor ---
    t_idx = jax.lax.axis_index(TIME_AXIS)
    n_t = jax.lax.axis_size(TIME_AXIS)
    tail = iq_local[n - halo_len:]
    perm = [(i, i + 1) for i in range(n_t - 1)]
    recv = jax.lax.ppermute(tail, TIME_AXIS, perm)  # shard 0 receives zeros

    total = jnp.concatenate([recv, iq_local], axis=0).astype(jnp.float32)

    # --- channelize: strided complex conv on the MXU ---
    lhs = total.T[None]  # [1, 2, H+N]
    cr, ci = taps[..., 0], taps[..., 1]
    rhs = jnp.stack(
        [jnp.stack([cr, -ci], axis=1), jnp.stack([ci, cr], axis=1)], axis=1
    ).reshape(2 * nr_ch, 2, nr_taps)
    conv = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(d,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
    )[0]  # [2C, KL_full]
    kl = k_local + 1  # one extra output to seed the FM history
    acc = conv[:, :kl].reshape(nr_ch, 2, kl)

    # --- analytic oscillator at global output index ---
    g0 = t_idx.astype(jnp.int32) * k_local - (halo_len // d)
    k = (g0 + jnp.arange(kl, dtype=jnp.int32)).astype(jnp.float32)
    theta = omega.astype(jnp.float32)[:, None] * k[None, :]
    rot_re, rot_im = jnp.cos(theta), jnp.sin(theta)
    ch_re = acc[:, 0] * rot_re - acc[:, 1] * rot_im
    ch_im = acc[:, 0] * rot_im + acc[:, 1] * rot_re

    # --- FM discriminator (prev sample = extra leading output) ---
    s_re = ch_re[:, 1:] * ch_re[:, :-1] + ch_im[:, 1:] * ch_im[:, :-1]
    s_im = ch_im[:, 1:] * ch_re[:, :-1] - ch_re[:, 1:] * ch_im[:, :-1]
    phi = fast_atan2(s_im, s_re)
    pcm = jnp.trunc((phi / _PI_F32) * jnp.float32(q14.Q14_ONE)).astype(jnp.int16)
    return pcm  # [C_local, K_local]


def make_sharded_multifm(plan, mesh):
    """Build a jitted sharded processor for a ChannelFirPlan over ``mesh``.

    Returns ``fn(iq[S, 2] int16) -> pcm[C, S//D] int16`` with S divided
    evenly across the time axis. The first ``(carry_len + D) // D + 1``
    outputs of the stream are zero-primed warmup.
    """
    d = plan.decimation
    halo = plan.carry_len + d
    taps = jnp.asarray(plan.taps_f32)
    omega = jnp.asarray(plan.omega_d.astype(np.float32))

    local = functools.partial(_local_channelize_fm, decimation=d, halo_len=halo)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(TIME_AXIS, None),           # iq: time-sharded, replicated over channels
            P(CHANNEL_AXIS, None, None),  # taps: channel-sharded
            P(CHANNEL_AXIS),              # omega
        ),
        out_specs=P(CHANNEL_AXIS, TIME_AXIS),
    )

    @jax.jit
    def process(iq):
        return fn(iq, taps, omega)

    return process
