"""DC blocker: differentiator followed by a leaky integrator.

Reference recurrence (``filter/dc_blocker.h:72-93``), all int32::

    acc  -= x_prev
    x_prev = s[n] << 14
    acc  += x_prev - p * y_prev
    y_prev = acc >> 14
    out[n] = (int16) y_prev

with ``p = (int16)((1 - pole) * 2^14)`` (``dc_blocker.h:56``).

This is a genuinely serial recurrence (the >>14 quantization breaks
associativity), so the exact tier is a ``lax.scan``. The fast tier rewrites
the float equivalent as a first-order IIR and evaluates it with
``lax.associative_scan`` (log-depth on the VPU): with q = 1 - p/2^14,

    y[n] = q * y[n-1] + (x[n] - x[n-1])
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tsl_sdr_tpu.ops import q14


class DcBlockerState(NamedTuple):
    x_prev: jnp.ndarray  # [] or [...] int32, Q.28
    y_prev: jnp.ndarray  # int32, Q.14
    acc: jnp.ndarray     # int32, Q.28


def make_pole_coeff(pole: float) -> int:
    """p = (int16)((1.0 - pole) * 2^14) — C truncating cast."""
    import numpy as np

    return int(np.trunc((1.0 - pole) * q14.Q14_ONE).astype(np.int16))


def init_dc_blocker_state(batch_shape=()) -> DcBlockerState:
    z = jnp.zeros(batch_shape, dtype=jnp.int32)
    return DcBlockerState(x_prev=z, y_prev=z, acc=z)


def dc_blocker_step_exact(state: DcBlockerState, block, p: int):
    """block: [N] int16 PCM -> ([N] int16, new state). Bit-exact scan."""
    x = jnp.asarray(block).astype(jnp.int32)
    p32 = jnp.int32(p)

    def step(st, s):
        acc = st.acc - st.x_prev
        x_prev = s << q14.Q14_SHIFT
        acc = acc + x_prev - p32 * st.y_prev
        y_prev = acc >> q14.Q14_SHIFT
        out = y_prev.astype(jnp.int16)
        return DcBlockerState(x_prev=x_prev, y_prev=y_prev, acc=acc), out

    new_state, out = jax.lax.scan(step, state, x)
    return new_state, out


def dc_blocker_step_fast(state: DcBlockerState, block, p: int):
    """Float tier: log-depth associative scan of the equivalent IIR.

    Accepts/returns the same int state pytree; outputs int16 PCM that tracks
    the exact tier to within integer-quantization error (+/- a few LSB).
    """
    x = jnp.asarray(block).astype(jnp.float32)
    qf = jnp.float32(1.0 - p / q14.Q14_ONE)
    x_prev_f = state.x_prev.astype(jnp.float32) / q14.Q14_ONE
    y_prev_f = state.y_prev.astype(jnp.float32)

    u = x - jnp.concatenate([x_prev_f[None], x[:-1]])
    # y[n] = qf*y[n-1] + u[n]  via associative scan over (A, B): y = A*y0 + B
    a_seq = jnp.full_like(u, qf)
    b_seq = u

    def combine(l, r):
        return (l[0] * r[0], r[0] * l[1] + r[1])

    a_cum, b_cum = jax.lax.associative_scan(combine, (a_seq, b_seq))
    y = a_cum * y_prev_f + b_cum
    out = jnp.clip(jnp.round(y), -32768, 32767).astype(jnp.int16)
    new_state = DcBlockerState(
        x_prev=(x[-1] * q14.Q14_ONE).astype(jnp.int32),
        y_prev=jnp.round(y[-1]).astype(jnp.int32),
        acc=state.acc,  # acc is not tracked in the float tier
    )
    return new_state, out
