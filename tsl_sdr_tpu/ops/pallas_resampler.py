"""Fused Pallas TPU kernel for the rational resampler.

Single-kernel form of the frame-shift matmul tier
(:func:`tsl_sdr_tpu.ops.polyphase._resample_fast_kernel`): the XLA version
materializes the `[M, S*D_rep]` float windows to HBM between the int16
convert, the S-way concat and the matmul; this kernel builds them in VMEM.

Grid/halo pattern mirrors :mod:`tsl_sdr_tpu.ops.pallas_chain`: the frame
array `[M_pad, D_rep]` is bound twice with block shape `[TM, D_rep]` (view A
at block i, view B at i+1), giving each program its `S-1` spill frames with
automatic double-buffering. Program i emits outputs for frames
`[i*TM, (i+1)*TM)`.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tsl_sdr_tpu.ops.polyphase import ResamplerPlan


def _resample_kernel(fa_ref, fb_ref, w_ref, out_ref, *, s_shifts, d_rep):
    # Mosaic rejects lane-concatenation of sublane-shifted slices, so instead
    # of one [TM, S*D] @ [S*D, I] product, accumulate S row-shifted
    # [TM, D] @ [D, I] products — same arithmetic, compiles cleanly.
    tm = fa_ref.shape[0]
    x = jnp.concatenate(
        [fa_ref[:].astype(jnp.float32), fb_ref[: s_shifts - 1].astype(jnp.float32)]
    ) if s_shifts > 1 else fa_ref[:].astype(jnp.float32)
    acc = jnp.dot(
        x[0:tm], w_ref[0:d_rep], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    for s0 in range(1, s_shifts):
        acc = acc + jnp.dot(
            x[s0 : s0 + tm], w_ref[s0 * d_rep : (s0 + 1) * d_rep],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("tm", "s_shifts", "d_rep", "i_rep",
                                              "interpret"))
def _resample_call(frames, wf, *, tm, s_shifts, d_rep, i_rep, interpret):
    m_pad, _ = frames.shape
    grid = m_pad // tm - 1
    kernel = functools.partial(_resample_kernel, s_shifts=s_shifts,
                               d_rep=d_rep)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tm, d_rep), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, d_rep), lambda i: (i + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, i_rep), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid * tm, i_rep), jnp.float32),
        interpret=interpret,
    )(frames, frames, wf)


def _is_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # noqa: BLE001
        return False


def resample_capture_pallas(plan: ResamplerPlan, pcm, tile_frames: int = 512,
                            interpret: bool | None = None):
    """Whole-capture resample via the fused kernel.

    pcm: [N] int16, N a multiple of D_rep. Returns float32
    [N * I_rep / D_rep] — output k is the window at input offset
    ``k * D // I`` (same indexing as the sharded resampler; the final
    ``S-1`` frames' outputs read zero padding).
    """
    if plan.phase0 != 0:
        raise ValueError("pallas resampler supports phase0 == 0 plans")
    interpret = (not _is_tpu()) if interpret is None else interpret
    pcm = jnp.asarray(pcm, jnp.int16)
    n = pcm.shape[0]
    if n % plan.d_rep:
        raise ValueError(f"input length {n} not a multiple of {plan.d_rep}")
    m = n // plan.d_rep
    grid = -(-m // tile_frames)
    m_pad = (grid + 1) * tile_frames
    frames = jnp.concatenate(
        [pcm.reshape(m, plan.d_rep),
         jnp.zeros((m_pad - m, plan.d_rep), jnp.int16)]
    )
    out = _resample_call(
        frames, jnp.asarray(plan.w_frames),
        tm=tile_frames, s_shifts=plan.frame_shifts,
        d_rep=plan.d_rep, i_rep=plan.i_rep, interpret=interpret,
    )
    return out[:m].reshape(-1)
