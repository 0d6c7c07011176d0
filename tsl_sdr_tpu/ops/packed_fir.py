"""Lane-packed multi-channel decimating FIR — the TPU speed-of-light tier.

This is the performance-critical reformulation of the reference channelizer
hot loop (``filter/direct_fir.c:329-417`` — per-output complex MAC over
``nr_taps`` taps at stride ``decimation``). The bit-exact integer tier lives
in :mod:`tsl_sdr_tpu.ops.fir`; this module is the float32 production tier,
designed around two TPU hardware facts:

1. **The VPU/MXU are 128 lanes wide.** Arrays shaped ``[N, 2]`` (IQ pairs) or
   ``[K, C]`` with small C waste up to 98% of every vector register. All
   arrays here keep a trailing dimension that is a multiple of 128.
2. **The MXU wants one large matmul, not strided windows.** The decimating
   FIR is re-blocked so it becomes a dense ``[rows, ROW] @ [ROW, COLS]``
   product:

   The interleaved int16 stream (``re,im,re,im,…``) is reshaped into rows of
   ``ROW = lcm(2*D, 128)`` values; each row yields ``OPR = ROW/(2*D)``
   decimated outputs for every channel. Output ``j`` of row ``r`` needs the
   ``2*T`` values starting at offset ``2*D*j`` in the row — a window that may
   spill up to ``WIN - ROW`` values into following rows. The tap matrix is
   therefore built as ``Wf[WIN, 2*OPR*C]`` (column layout ``[re/im, j, c]``)
   and split into ROW-row chunks ``W_0 … W_CR``; the product is assembled as

       P[r] = sum_i (rows @ W_i)[r + i]

   i.e. one dense matmul per chunk plus a cheap row shift — no overlapping
   gather, no strided conv, no halo concat. ``P[:, :OPR*C]`` reshapes
   directly to the real part ``[K, C]`` and the back half to the imaginary
   part.

Matmuls run with ``Precision.HIGHEST``: XLA's default f32 matmul on TPU
drops to bf16 passes, which is far too coarse for Q.14-scale DSP data.

Streaming works on value-aligned carries: each step consumes a block of
``N`` samples (``2*N`` divisible by ``ROW``) plus ``CR`` carried rows of
history, and emits exactly ``N/D`` outputs per channel.

The derotator of the reference (``direct_fir.c:152-172``) is NOT applied
here: for FM demodulation the per-output rotation ``e^{j*omega_d*k}``
contributes a constant ``omega_d`` to the discriminated phase difference, so
:func:`tsl_sdr_tpu.ops.fm.fm_from_baseband` folds it into a post-atan2 add
(saving the cos/sin oscillator and complex rotate entirely). Consumers that
need rotated IQ (e.g. a Costas loop) use :func:`nco_rotate`, an integer-NCO
oscillator whose int32 wraparound keeps full phase precision at any absolute
output index.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from tsl_sdr_tpu.ops.fir import design_channel_taps

_HIGHEST = jax.lax.Precision.HIGHEST


class PackedFirPlan(NamedTuple):
    """Static host-side plan for the lane-packed channel bank."""

    w_chunks: tuple       # tuple of np.ndarray [ROW, COLS] f32 tap chunks
    w_chunks_i16: tuple   # same layout, int16 Q.14 (bit-exact tier)
    rot_incr_i32: np.ndarray  # [C, 2] int32 Q.14 derotator increment
    omega_d: np.ndarray  # [C] float64: per-output derotation increment (rad)
    row: int             # values per packed row (= lcm(2D, 128))
    opr: int             # outputs per row (= row / (2D))
    win: int             # window span in values (= row - 2D + 2T)
    cr_rows: int         # carried history rows
    decimation: int
    nr_taps: int
    nr_channels: int

    @property
    def carry_vals(self) -> int:
        return self.cr_rows * self.row

    @property
    def carry_len(self) -> int:
        """Carry length in samples (for stream-prefix priming)."""
        return self.carry_vals // 2

    @property
    def block_quantum(self) -> int:
        """Block lengths must be a multiple of this many samples."""
        return self.row // 2


def make_packed_fir_plan(
    lpf_taps,
    offsets_hz,
    sample_rate: float,
    decimation: int,
    gains=None,
) -> PackedFirPlan:
    """Build the packed plan for a bank of channels on one wideband input.

    Mirrors the tap synthesis of the reference (``multifm/demod.c:205-243``):
    per channel the real LPF is shifted to a complex bandpass filter at
    ``-offset``; the per-output derotation increment is ``-2*pi*offset/fs*D``
    (``filter/direct_fir.c:65-76``).
    """
    lpf_taps = np.asarray(lpf_taps, dtype=np.float64)
    offsets_hz = np.atleast_1d(np.asarray(offsets_hz, dtype=np.float64))
    nr_ch = offsets_hz.shape[0]
    nr_taps = lpf_taps.shape[0]
    d = int(decimation)
    if gains is None:
        gains = np.ones(nr_ch)
    gains = np.broadcast_to(np.asarray(gains, dtype=np.float64), (nr_ch,))

    row = math.lcm(2 * d, 128)
    opr = row // (2 * d)
    win = row + max(2 * (nr_taps - d), 0)
    cr_rows = -(-(win - row) // row) if win > row else 0

    cols = 2 * opr * nr_ch
    wf = np.zeros((win, 2, opr, nr_ch), dtype=np.float32)
    wq = np.zeros((win, 2, opr, nr_ch), dtype=np.int16)
    tidx = 2 * np.arange(nr_taps)
    omega_d = np.empty(nr_ch, dtype=np.float64)
    rot_incr = np.empty((nr_ch, 2), dtype=np.int32)
    from tsl_sdr_tpu.ops import q14

    for c in range(nr_ch):
        taps, f_offs = design_channel_taps(
            lpf_taps, offsets_hz[c], sample_rate, gains[c]
        )
        omega_d[c] = f_offs * d
        incr = np.exp(1j * f_offs * d)
        rot_incr[c, 0] = q14.quantize_q14_i32(incr.real)
        rot_incr[c, 1] = q14.quantize_q14_i32(incr.imag)
        cr = taps.real.astype(np.float32)
        ci = taps.imag.astype(np.float32)
        # bit-exact tier uses the reference's truncating tap quantization
        # (multifm/demod.c:214-218)
        qr = q14.quantize_q14(taps.real)
        qi = q14.quantize_q14(taps.imag)
        for j in range(opr):
            vre = 2 * d * j + tidx
            # out_re += cr*xr - ci*xi ; out_im += ci*xr + cr*xi
            wf[vre, 0, j, c] += cr
            wf[vre + 1, 0, j, c] -= ci
            wf[vre, 1, j, c] += ci
            wf[vre + 1, 1, j, c] += cr
            wq[vre, 0, j, c] += qr
            wq[vre + 1, 0, j, c] -= qi
            wq[vre, 1, j, c] += qi
            wq[vre + 1, 1, j, c] += qr
    wf = wf.reshape(win, cols)
    wq = wq.reshape(win, cols)

    padded = np.zeros(((cr_rows + 1) * row, cols), dtype=np.float32)
    padded[:win] = wf
    chunks = tuple(
        padded[i * row : (i + 1) * row] for i in range(cr_rows + 1)
    )
    padded_q = np.zeros(((cr_rows + 1) * row, cols), dtype=np.int16)
    padded_q[:win] = wq
    chunks_q = tuple(
        padded_q[i * row : (i + 1) * row] for i in range(cr_rows + 1)
    )
    return PackedFirPlan(
        w_chunks=chunks,
        w_chunks_i16=chunks_q,
        rot_incr_i32=rot_incr,
        omega_d=omega_d,
        row=row,
        opr=opr,
        win=win,
        cr_rows=cr_rows,
        decimation=d,
        nr_taps=nr_taps,
        nr_channels=nr_ch,
    )


def init_packed_carry(plan: PackedFirPlan, prefix=None) -> jnp.ndarray:
    """Initial carry: ``carry_vals`` interleaved int16 values.

    ``prefix`` (optional): the first ``plan.carry_len`` samples ([n, 2]
    int16) of the stream, aligning output sample indices with a reference
    run primed the same way. ``None`` = cold (zero) start.
    """
    if prefix is None:
        return jnp.zeros((plan.carry_vals,), dtype=jnp.int16)
    prefix = jnp.asarray(prefix, dtype=jnp.int16)
    assert prefix.shape == (plan.carry_len, 2), prefix.shape
    return prefix.reshape(-1)


def packed_fir_step(plan: PackedFirPlan, carry_vals, block):
    """One streaming step.

    carry_vals: [plan.carry_vals] int16 (interleaved values)
    block: int16 IQ — either flat interleaved ``[2N]`` (preferred: a device
    array shaped ``[N, 2]`` has a pathological 2-lane layout; np arrays
    reshape for free on the host) or ``[N, 2]``. N must be a multiple of
    ``plan.block_quantum``.
    Returns (new_carry_vals, ar, ai) with ar/ai ``[rows, opr*C]`` float32 —
    channelized, decimated, NOT derotated baseband in flat (k, c) order.
    """
    if isinstance(block, np.ndarray):
        block = block.reshape(-1)  # free on host
    block = jnp.asarray(block, dtype=jnp.int16)
    if block.ndim == 2:
        block = block.reshape(-1)
    n = block.shape[0] // 2
    if n % plan.block_quantum != 0:
        raise ValueError(
            f"block length {n} must be a multiple of {plan.block_quantum}"
        )
    vals = jnp.concatenate([carry_vals, block])
    r_tot = vals.shape[0] // plan.row
    rows = vals.reshape(r_tot, plan.row)
    r_valid = r_tot - plan.cr_rows

    # int16 x int16 -> int32 matmul: the MXU's native integer path runs
    # ~1.6x faster than f32-HIGHEST here, skips the int16->f32 conversion
    # pass entirely, and uses the REFERENCE's own Q.14 tap quantization
    # (multifm/demod.c:214-218) — so the fast tier's filter response equals
    # the C filter's, with full-precision (unrounded) int32 accumulators.
    # P[r] = sum_i Q_i[r + i] (window spill into the i-th following row).
    # Only r_valid output rows exist and i <= cr_rows, so Q_i[i : i+r_valid]
    # is always in bounds: plain STATIC slices — no zero-concat, no
    # dynamic slice, nothing materialized beyond the matmul results.
    p = jnp.dot(
        rows,
        jnp.asarray(plan.w_chunks_i16[0]),
        preferred_element_type=jnp.int32,
    )[:r_valid]
    for i, w in enumerate(plan.w_chunks_i16[1:], start=1):
        q = jnp.dot(rows, jnp.asarray(w), preferred_element_type=jnp.int32)
        p = p + q[i : i + r_valid]
    p = p.astype(jnp.float32)
    half = plan.opr * plan.nr_channels
    # Keep the natural [rows, opr*C] layout — its flat order is (k, c), so
    # consumers index it like [K, C] without paying a 64-lane -> C-lane
    # relayout (which costs more than the matmuls themselves).
    ar = p[:, :half]
    ai = p[:, half : 2 * half]
    new_carry = jax.lax.dynamic_slice_in_dim(
        vals, r_valid * plan.row, plan.carry_vals
    )
    return new_carry, ar, ai


def packed_fir_step_exact(plan: PackedFirPlan, carry_vals, block):
    """Bit-exact integer tier of :func:`packed_fir_step`.

    The reference's per-output complex MAC accumulates int16*int16 products
    into a wrapping int32 (``filter/direct_fir.c:366-385``); int32 modular
    addition is order-independent, so the same lane-packed matmul computes
    it EXACTLY — the MXU's int16 path accumulates int32 with two's-complement
    wrap (verified on hardware). Returns (carry, a_re, a_im) with a_re/a_im
    ``[rows, opr*C]`` int16: the Q.28->Q.14 rounded, NOT-yet-derotated
    accumulators (reference rounding ``filter/complex.h:30-34``). Derotation
    is the serial Q.14 rotator — precomputed by the native helper
    ``tsl_rotator_seq`` and applied by the caller.
    """
    if isinstance(block, np.ndarray):
        block = block.reshape(-1)
    block = jnp.asarray(block, dtype=jnp.int16)
    if block.ndim == 2:
        block = block.reshape(-1)
    n = block.shape[0] // 2
    if n % plan.block_quantum != 0:
        raise ValueError(
            f"block length {n} must be a multiple of {plan.block_quantum}"
        )
    vals = jnp.concatenate([carry_vals, block])
    r_tot = vals.shape[0] // plan.row
    rows = vals.reshape(r_tot, plan.row)
    r_valid = r_tot - plan.cr_rows

    # static-slice spill adds (see packed_fir_step): wrap-exact int32 sums
    # are order-independent, so the restructuring preserves bit-exactness
    p = jnp.dot(
        rows, jnp.asarray(plan.w_chunks_i16[0]),
        preferred_element_type=jnp.int32,
    )[:r_valid]
    for i, w in enumerate(plan.w_chunks_i16[1:], start=1):
        q = jnp.dot(rows, jnp.asarray(w), preferred_element_type=jnp.int32)
        p = p + q[i : i + r_valid]
    half = plan.opr * plan.nr_channels
    from tsl_sdr_tpu.ops import q14

    a_re = q14.round_q28_q14(p[:, :half])
    a_im = q14.round_q28_q14(p[:, half : 2 * half])
    new_carry = jax.lax.dynamic_slice_in_dim(
        vals, r_valid * plan.row, plan.carry_vals
    )
    return new_carry, a_re, a_im


def omega_turns_i32(omega_d: np.ndarray) -> np.ndarray:
    """Per-output phase increment as signed-int32 turns (2^32 = one turn)."""
    turns = np.asarray(omega_d, dtype=np.float64) / (2.0 * np.pi)
    frac = turns - np.round(turns)
    return np.round(frac * 2.0**32).astype(np.int64).astype(np.int32)


def nco_rotate(ar, ai, omega_i32, k0):
    """Rotate baseband by ``e^{j*omega_d*k}`` with an integer NCO.

    ar/ai: [K, C] float32; omega_i32: [C] int32 turns (:func:`omega_turns_i32`);
    k0: scalar int32 absolute index of output 0. Phase is accumulated in
    int32 **turns** so wraparound is exact — float phase ``omega*k`` loses
    all precision once ``k`` is large, an NCO never does.
    """
    k = k0 + jnp.arange(ar.shape[0], dtype=jnp.int32)
    ph = k[:, None] * omega_i32[None, :]  # int32 wrap == mod 2^32 turns
    th = ph.astype(jnp.float32) * jnp.float32(2.0 * np.pi / 2.0**32)
    rr = jnp.cos(th)
    ri = jnp.sin(th)
    return ar * rr - ai * ri, ar * ri + ai * rr
