"""2nd-order Costas loop (coherent PLL demodulator).

Reference behavior (``multifm/costas_demod.c:26-115``): per int16 IQ sample
(scaled by 2^-14): rotate by the NCO ``e^{-j phase}``, error = Im*Re clamped
to +/-e_max, PI update ``f_dev += beta*err; phase += f_dev + alpha*err``
(phase computed with the *updated, unclamped* f_dev, then f_dev clamped to
+/-0.3 rad around nominal), phase wrapped with fmod. Output is the rotated
IQ re-scaled to int16.

A true serial recurrence -> ``lax.scan`` tier for on-device streaming plus
a numpy host tier. Float32 both ways (the reference is float).

The reference builds this demod but never wires it to a config path
(``multifm/demod.c:318`` instantiates only FM); we expose it as a first-class
chain stage.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from tsl_sdr_tpu.ops import q14

TWO_PI = np.float32(2 * np.pi)


class CostasParams(NamedTuple):
    alpha: float
    beta: float
    f_dev_nominal: float   # 2*pi*f_shift (radians/sample)
    f_dev_min: float
    f_dev_max: float
    e_max: float


def make_costas_params(
    f_shift: float, alpha: float, beta: float, e_max_q14: int
) -> CostasParams:
    f_dev = 2.0 * np.pi * f_shift
    return CostasParams(
        alpha=float(alpha),
        beta=float(beta),
        f_dev_nominal=float(f_dev),
        f_dev_min=float(f_dev) - 0.3,
        f_dev_max=float(f_dev) + 0.3,
        e_max=float(e_max_q14) / q14.Q14_ONE,
    )


class CostasState(NamedTuple):
    last_phase: jnp.ndarray  # f32 scalar
    f_dev: jnp.ndarray       # f32 scalar


def init_costas_state(params: CostasParams) -> CostasState:
    return CostasState(
        last_phase=jnp.float32(0.0), f_dev=jnp.float32(params.f_dev_nominal)
    )


def costas_step(params: CostasParams, state: CostasState, block):
    """block: [N, 2] int16 IQ -> (state, out [N, 2] int16 rotated IQ)."""
    x = jnp.asarray(block).astype(jnp.float32) / q14.Q14_ONE
    alpha = jnp.float32(params.alpha)
    beta = jnp.float32(params.beta)
    e_max = jnp.float32(params.e_max)
    dev_min = jnp.float32(params.f_dev_min)
    dev_max = jnp.float32(params.f_dev_max)

    def step(st, samp):
        phase, f_dev = st
        c = jnp.cos(-phase)
        s = jnp.sin(-phase)
        o_re = samp[0] * c - samp[1] * s
        o_im = samp[0] * s + samp[1] * c
        error = jnp.clip(o_im * o_re, -e_max, e_max)
        f_dev = f_dev + beta * error
        new_phase = phase + f_dev + alpha * error
        f_dev = jnp.clip(f_dev, dev_min, dev_max)
        new_phase = jnp.mod(new_phase, TWO_PI)
        return (new_phase, f_dev), jnp.stack([o_re, o_im])

    (phase, f_dev), out = jax.lax.scan(
        step, (state.last_phase, state.f_dev), x
    )
    out_i16 = jnp.trunc(out * q14.Q14_ONE).astype(jnp.int16)
    return CostasState(last_phase=phase, f_dev=f_dev), out_i16


def costas_np(params: CostasParams, block, last_phase=0.0, f_dev=None):
    """Numpy host oracle with C float32 semantics (fmodf wrapping)."""
    if f_dev is None:
        f_dev = params.f_dev_nominal
    x = np.asarray(block).astype(np.float32) / q14.Q14_ONE
    out = np.zeros_like(x)
    phase = np.float32(last_phase)
    f_dev = np.float32(f_dev)
    for i in range(x.shape[0]):
        nco = np.exp(-1j * np.complex64(phase))
        o = (x[i, 0] + 1j * x[i, 1]) * nco
        o_re, o_im = np.float32(o.real), np.float32(o.imag)
        error = np.float32(o_im * o_re)
        error = min(max(error, -params.e_max), params.e_max)
        f_dev = np.float32(f_dev + np.float32(params.beta) * error)
        new_phase = np.float32(phase + f_dev + np.float32(params.alpha) * error)
        f_dev = np.float32(min(max(f_dev, params.f_dev_min), params.f_dev_max))
        phase = np.float32(np.fmod(new_phase, np.float32(2 * np.pi)))
        out[i, 0], out[i, 1] = o_re, o_im
    return np.trunc(out * q14.Q14_ONE).astype(np.int16), (phase, f_dev)
