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


def _costas_chunks(params: CostasParams, phase0, f_dev0, xr, xi, L: int):
    """Closed-form chunked PI updates over ``[n, L, C]`` planes.

    Per chunk the NCO phase is predicted linearly (``phase0 + k*f_dev`` —
    no intra-chunk error feedback on the rotation), and the serial PI
    integration is applied exactly in closed form::

        S      = sum_k err_k
        f_dev' = clip(f_dev + beta * S)
        phase' = phase0 + L*f_dev + beta * sum_k (L-k)*err_k + alpha * S

    (the ``(L-k)`` ramp is the exact integral of the serial recurrence
    ``f_dev += beta*err; phase += f_dev + alpha*err`` — f_dev updates
    BEFORE the phase increment, matching costas_step and the reference
    ``multifm/costas_demod.c:56-115``; the other order would need a
    ``(L-1-k)`` ramp — with the predicted errors; only the per-sample
    f_dev clamp collapses to one clamp per chunk). For loop gains ``alpha, beta << 1`` and ``L * loop_bandwidth
    << 1`` this tracks the serial loop (diffed in tests).
    """
    alpha = jnp.float32(params.alpha)
    beta = jnp.float32(params.beta)
    e_max = jnp.float32(params.e_max)
    dev_min = jnp.float32(params.f_dev_min)
    dev_max = jnp.float32(params.f_dev_max)
    idx = jnp.arange(L, dtype=jnp.float32)[:, None]      # [L, 1]
    ramp_w = jnp.float32(L) - idx                        # (L - k)

    def cstep(st, xc):
        phase0, f_dev = st                               # [C]
        ph = phase0[None, :] + f_dev[None, :] * idx      # [L, C]
        c = jnp.cos(ph)
        s = jnp.sin(ph)
        xcr, xci = xc
        o_re = xcr * c + xci * s                         # x * e^{-j ph}
        o_im = xci * c - xcr * s
        err = jnp.clip(o_im * o_re, -e_max, e_max)
        s_tot = jnp.sum(err, axis=0)
        ramp = jnp.sum(ramp_w * err, axis=0)
        f_dev2 = jnp.clip(f_dev + beta * s_tot, dev_min, dev_max)
        phase2 = jnp.mod(
            phase0 + jnp.float32(L) * f_dev + beta * ramp + alpha * s_tot,
            TWO_PI,
        )
        return (phase2, f_dev2), (o_re, o_im)

    return jax.lax.scan(cstep, (phase0, f_dev0), (xr, xi))


def stable_chunk(
    params: CostasParams,
    amp2: float = 0.25,
    target: float = 0.4,
    max_chunk: int = 512,
) -> int:
    """Largest chunk length that keeps the chunked loop stable.

    Linearizing the closed-form update for a small phase error ``theta``
    (error ``~ amp2 * theta`` for a half-scale carrier), one chunk applies
    a phase gain ``g = (alpha*L + beta*L^2/2) * amp2``; the serial loop's
    per-sample feedback keeps g tiny, but the chunk approximation needs
    ``g < 1`` (we target 0.4 for damping margin). Solve for L.
    """
    a = params.beta * amp2 / 2.0
    b = params.alpha * amp2
    if a > 0:
        l_max = (-b + np.sqrt(b * b + 4.0 * a * target)) / (2.0 * a)
    elif b > 0:
        l_max = target / b
    else:
        l_max = max_chunk
    return int(max(4, min(max_chunk, l_max)))


def costas_block_planes(
    params: CostasParams, state: CostasState, xr, xi, chunk: int | None = None
):
    """Production device tier: chunk-parallel Costas over ``[K, C]`` planes.

    ``xr``/``xi``: float32 Q.14-normalized channel planes (int16 samples
    divided by ``q14.Q14_ONE``, the units :func:`costas_step` uses
    internally; time-major, channels across lanes — never ``[N, 2]``-shaped
    hot data). ``state`` leaves are ``[C]``. Returns
    ``(state, o_re [K, C], o_im [K, C])`` in the same normalized units.

    ``chunk=None`` derives the largest stability-bounded chunk from the
    loop gains (:func:`stable_chunk`). Chunk boundaries land at absolute
    stream positions ``k * chunk``, so feeding a stream in any block sizes
    that are multiples of ``chunk`` yields identical output
    (block-boundary invariance, tested).
    """
    if chunk is None:
        chunk = stable_chunk(params)
    k_tot, c = xr.shape
    if k_tot == 0:
        empty = jnp.zeros((0, c), xr.dtype)
        return state, empty, empty
    st = (state.last_phase, state.f_dev)
    outs_r, outs_i = [], []
    n_full = k_tot // chunk
    if n_full:
        st, (o_r, o_i) = _costas_chunks(
            params, st[0], st[1],
            xr[: n_full * chunk].reshape(n_full, chunk, c),
            xi[: n_full * chunk].reshape(n_full, chunk, c),
            chunk,
        )
        outs_r.append(o_r.reshape(-1, c))
        outs_i.append(o_i.reshape(-1, c))
    rem = k_tot - n_full * chunk
    if rem:
        st, (o_r, o_i) = _costas_chunks(
            params, st[0], st[1],
            xr[n_full * chunk :].reshape(1, rem, c),
            xi[n_full * chunk :].reshape(1, rem, c),
            rem,
        )
        outs_r.append(o_r.reshape(-1, c))
        outs_i.append(o_i.reshape(-1, c))
    o_re = jnp.concatenate(outs_r) if len(outs_r) > 1 else outs_r[0]
    o_im = jnp.concatenate(outs_i) if len(outs_i) > 1 else outs_i[0]
    return CostasState(last_phase=st[0], f_dev=st[1]), o_re, o_im


def costas_block_step(
    params: CostasParams, state: CostasState, block, chunk: int | None = None
):
    """Single-channel convenience wrapper over :func:`costas_block_planes`
    with the :func:`costas_step` interface (``[N, 2] int16 -> [N, 2]
    int16``). ``state`` leaves are scalars."""
    x = jnp.asarray(block).astype(jnp.float32) / q14.Q14_ONE
    st_c = CostasState(
        last_phase=state.last_phase.reshape(1), f_dev=state.f_dev.reshape(1)
    )
    st2, o_re, o_im = costas_block_planes(
        params, st_c, x[:, :1], x[:, 1:], chunk=chunk
    )
    out = jnp.stack([o_re[:, 0], o_im[:, 0]], axis=-1)
    out_i16 = jnp.trunc(out * q14.Q14_ONE).astype(jnp.int16)
    return (
        CostasState(
            last_phase=st2.last_phase[0], f_dev=st2.f_dev[0]
        ),
        out_i16,
    )


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
