"""Q.14 fixed-point primitives (the reference's "Q.15" that is really Q.14).

The reference keeps int16 samples with unity = ``1 << 14`` and names the
format Q.15 throughout (``Q_15_SHIFT = 14``, reference ``filter/filter.h:16``).
We keep the *behavior* and correct the *name*: everything here is Q.14.

Bit-exactness contract (reference ``filter/complex.h:30-62``):

* ``round_q28_q14(a)``  = ``(a >> 14) + ((a >> 13) & 1)`` on int32, result
  implicitly narrowed to int16 (two's-complement wrap), i.e. truncating shift
  plus a round-half-up bit.
* products are int16 x int16 -> int32 and accumulate in int32 **without
  saturation** (wraparound is part of the contract).
* tap quantization is a C double->int16 cast, which truncates toward zero
  (reference ``multifm/demod.c:242-243``, ``resampler/resampler.c:148-151``).

All functions work on plain ``jnp`` arrays and trace cleanly under ``jit``.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

Q14_SHIFT = 14
Q14_ONE = 1 << Q14_SHIFT  # 16384 == unity gain


def round_q28_q14(a):
    """Round an int32 Q.28 value to int16 Q.14 exactly as the C code does.

    ``(a >> 14) + ((a >> 13) & 1)`` with arithmetic shifts, then the implicit
    int32 -> int16 conversion (wraps mod 2**16).
    """
    a = a.astype(jnp.int32)
    r = (a >> Q14_SHIFT) + ((a >> (Q14_SHIFT - 1)) & 1)
    return r.astype(jnp.int16)


def cmul_q14_q28(a_re, a_im, b_re, b_im):
    """Complex multiply of Q.14 values, full-precision int32 Q.28 result."""
    a_re = a_re.astype(jnp.int32)
    a_im = a_im.astype(jnp.int32)
    b_re = b_re.astype(jnp.int32)
    b_im = b_im.astype(jnp.int32)
    return a_re * b_re - a_im * b_im, a_re * b_im + a_im * b_re


def cmul_q14_q14(a_re, a_im, b_re, b_im):
    """Complex multiply of Q.14 values, rounded back to int16 Q.14."""
    r_re, r_im = cmul_q14_q28(a_re, a_im, b_re, b_im)
    return round_q28_q14(r_re), round_q28_q14(r_im)


# ---------------------------------------------------------------------------
# Host-side (numpy) quantizers — run once at chain-build time, not in kernels.
# ---------------------------------------------------------------------------

def quantize_q14(x) -> np.ndarray:
    """Quantize float taps/values to int16 Q.14 with C cast semantics.

    C ``(int16_t)(x * 16384.0)`` truncates toward zero.
    """
    return np.trunc(np.asarray(x, dtype=np.float64) * Q14_ONE).astype(np.int16)


def quantize_q14_i32(x) -> np.ndarray:
    """Same truncating quantization but kept in int32 (derotator increments,
    reference ``filter/direct_fir.c:76-77``)."""
    return np.trunc(np.asarray(x, dtype=np.float64) * Q14_ONE).astype(np.int32)


def to_float(x, dtype=np.float32):
    """Q.14 int -> float (unity = 1.0)."""
    return (jnp.asarray(x).astype(dtype)) / Q14_ONE


def from_float(x):
    """Float (unity = 1.0) -> Q.14 int16, truncating like a C cast."""
    return jnp.trunc(jnp.asarray(x, dtype=jnp.float32) * Q14_ONE).astype(jnp.int16)
