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


def _split_bf16_np(a_f32: np.ndarray) -> np.ndarray:
    """Host presplit into (head, residual) planes with bf16-EXACT values,
    stored as f32 (same trick as ops/pallas_chain, except the planes stay
    f32: the dots below run at Precision.DEFAULT, which on the TPU MXU
    rounds f32 inputs to bf16 — lossless for these values — and
    accumulates in f32, while interpret mode computes a true f32 matmul.
    Passing actual bf16 arrays instead would make interpret mode
    accumulate in bf16 and fail the accuracy tests by ~3 orders)."""
    import ml_dtypes

    ah = a_f32.astype(ml_dtypes.bfloat16).astype(np.float32)
    al = a_f32 - ah
    return np.stack([ah, al])


def _dot3(x, w, precision):
    """bf16x4 or HIGHEST matmul; operands may be (head, residual) pairs.

    bf16x4 keeps ALL four cross terms: for int16-valued operands the
    (head, residual) split is exact and every product is exact in f32, so
    unlike the chain kernel's bf16x3 (whose dropped lo*lo error hides
    under the FM discriminator's phase normalization) this tier tracks
    the int16-exact XLA tier to f32 accumulation rounding (~0.002 PCM
    units measured) on RAW AMPLITUDE outputs."""
    if precision == "bf16x4":
        xh, xl = x
        wh, wl = w
        f32 = jnp.float32
        dflt = jax.lax.Precision.DEFAULT
        return (
            jnp.dot(xh, wh, preferred_element_type=f32, precision=dflt)
            + jnp.dot(xh, wl, preferred_element_type=f32, precision=dflt)
            + jnp.dot(xl, wh, preferred_element_type=f32, precision=dflt)
            + jnp.dot(xl, wl, preferred_element_type=f32, precision=dflt)
        )
    return jnp.dot(x, w, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def _row_kernel_v2(xc_ref, xa_ref, carry_ref, w0_ref, w1_ref, out_ref, *,
                   sp, precision, q_scale):
    """Packed-row streaming kernel. x row j == resampler 'total' row
    ``i*TR + j`` (the head row is the previous tile's last row; program 0
    swaps in the stream carry). Output row j is the k_row outputs of
    total row ``i*TR + j``: main [ROW_IN] window against w0 plus the
    first ``sp`` samples of the NEXT row against the trimmed spill
    matrix (``ops/polyphase.row_matmul_acc``'s arithmetic, fused)."""
    i = pl.program_id(0)
    tr = xa_ref.shape[0]
    head = jnp.where(i == 0, carry_ref[:], xc_ref[tr - 1:])
    x = jnp.concatenate([head, xa_ref[:]]).astype(jnp.float32)
    if precision == "bf16x4":
        xh = x.astype(jnp.bfloat16).astype(jnp.float32)
        xl = x - xh
        xm = (xh[:tr], xl[:tr])
        xs = (xh[1: tr + 1, :sp], xl[1: tr + 1, :sp]) if sp else None
        w0 = (w0_ref[0], w0_ref[1])
        w1 = (w1_ref[0][:sp], w1_ref[1][:sp]) if sp else None
    else:
        xm = x[:tr]
        xs = x[1: tr + 1, :sp] if sp else None
        w0 = w0_ref[:]
        w1 = w1_ref[:sp] if sp else None
    acc = _dot3(xm, w0, precision)
    if sp:
        acc = acc + _dot3(xs, w1, precision)
    out_ref[:] = acc * jnp.float32(q_scale)


@functools.partial(jax.jit, static_argnames=("tr", "sp", "precision",
                                             "q_scale", "interpret"))
def _row_call_v2(block_rows, carry_row, w0, w1, *, tr, sp, precision,
                 q_scale, interpret):
    m, row_in = block_rows.shape
    assert m % tr == 0, (m, tr)
    grid = m // tr
    k_row = w0.shape[-1]
    kernel = functools.partial(_row_kernel_v2, sp=sp, precision=precision,
                               q_scale=q_scale)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tr, row_in), lambda i: (jnp.maximum(i - 1, 0), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, row_in), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tr, k_row), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, k_row), jnp.float32),
        interpret=interpret,
    )(block_rows, block_rows, carry_row, w0, w1)


class PallasResampler:
    """Streaming packed-row rational resampler fused into one Pallas kernel
    (the fast tier of ``ops/polyphase.resample_step``, VMEM-resident; the
    frame-form kernel above wastes lanes on a [TM, D_rep] minor dim and
    loses badly — this is the channelizer kernel's row form applied to the
    resampler; reference hot loop ``filter/polyphase_fir.c:162-233``).

    Streaming contract: rows are the resampler's 'total' rows (ROW_IN
    samples each, first row = ``spill`` history samples ++ stream head).
    The carry is ONE row; ``step`` takes blocks that are a multiple of
    ``tile_rows`` rows and emits the k_row outputs of every row ending in
    the block's predecessor window — the concatenated output stream is
    value-identical (to the precision tier's tolerance) to the XLA
    packed-row tier fed the same stream.
    """

    def __init__(self, plan: ResamplerPlan, tile_rows: int = 1024,
                 precision: str = "high", interpret: bool | None = None):
        if not plan.k_row:
            raise ValueError("plan does not support the packed-row form")
        if plan.phase0 != 0:
            raise ValueError("packed-row pallas tier needs phase0 == 0")
        self.plan = plan
        self.tr = int(tile_rows)
        self.interpret = (not _is_tpu()) if interpret is None else interpret
        w0_np = plan.w_row_i16.astype(np.float32)
        sp_w = plan.w_spill_i16
        self.sp = int(sp_w.shape[0]) if sp_w is not None else 0
        w1_np = (sp_w.astype(np.float32) if sp_w is not None
                 else np.zeros((1, plan.k_row), np.float32))
        if precision == "high":
            self.precision = "bf16x4"
            # HOST np constants (never eager device arrays: an eager
            # device constant closed over by an outer jit makes every
            # first lowering fetch it device->host — see pallas_chain)
            self.w0 = _split_bf16_np(w0_np)
            self.w1 = _split_bf16_np(w1_np)
        elif precision == "highest":
            self.precision = "highest"
            self.w0, self.w1 = w0_np, w1_np
        else:
            raise ValueError(precision)
        from tsl_sdr_tpu.ops import q14

        self.q_scale = float(1.0 / q14.Q14_ONE)
        self._dev_cache = None

    @property
    def row_in(self) -> int:
        return self.plan.row_in

    def init_carry(self, head=None):
        """head: the first ROW_IN samples of the resampler's 'total'
        stream (``spill`` history samples ++ the stream head), or None
        for a zero history + zero head."""
        if head is None:
            return jnp.zeros((1, self.plan.row_in), jnp.int16)
        head = np.asarray(head, np.int16)
        assert head.shape == (self.plan.row_in,), head.shape
        return jnp.asarray(head[None, :])

    def _operands(self, example):
        from jax.core import Tracer

        if isinstance(example, Tracer):
            return self.w0, self.w1
        if self._dev_cache is None:
            self._dev_cache = (jax.device_put(self.w0),
                               jax.device_put(self.w1))
        return self._dev_cache

    def step(self, carry_row, block_vals):
        """carry [1, ROW_IN] int16; block_vals [m*ROW_IN] flat int16 with
        ``m`` a multiple of tile_rows. Returns (new_carry, out [m, K_ROW]
        f32): out row j = outputs of total row (block start row + j - 1).
        """
        row_in = self.plan.row_in
        block_rows = block_vals.reshape(-1, row_in)
        w0, w1 = self._operands(block_vals)
        out = _row_call_v2(
            block_rows, carry_row, w0, w1, tr=self.tr, sp=self.sp,
            precision=self.precision, q_scale=self.q_scale,
            interpret=self.interpret,
        )
        new_carry = jax.lax.dynamic_slice_in_dim(
            block_rows, block_rows.shape[0] - 1, 1
        )
        return new_carry, out


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
