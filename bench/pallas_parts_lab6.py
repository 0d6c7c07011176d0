#!/usr/bin/env python3
"""Parts lab v6: bisect the FM section's flat ~5 us/tile (run on TPU).

v1/v2: full-chain minus FIR leaves ~5 us/tile for the FM section at BOTH
8ch (65k elements) and 64ch (525k) — element-count-independent, so it's a
fixed cost: candidates are the two pltpu.roll ops per component, the
divide in atan2, or the select chains. Variants (8ch and 64ch, tr=1024,
bf16x3 FIR; all numerically WRONG except base — perf bisection only):

  base    — the shipped _chain_body
  noatan  — atan2 replaced by sim*sre (isolates the whole atan2 cost)
  nodiv   — atan2 poly with z = lo*hi instead of lo/hi (isolates divide)
  noroll  — prev taken as acc row-slice only, no lane rolls (isolates roll)
  slicecat— prev built from two static slices + lane concat (candidate
            replacement for the rolls if rolls are the cost)
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import numpy as np

TRIALS = 4


def _rate(step_fn, state0, blocks, samples_per_pass):
    import statistics

    from tsl_sdr_tpu.utils.benchtime import make_calibrated_bench

    bench = make_calibrated_bench(step_fn, state0, blocks, samples_per_pass)
    rates = [r for r in (bench() for _ in range(TRIALS)) if r is not None]
    return statistics.median(rates) if rates else float("nan")


def main(widths):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from tsl_sdr_tpu.models.channelizer import MultifmChain
    from tsl_sdr_tpu.ops import q14
    from tsl_sdr_tpu.ops.pallas_chain import (
        PallasChain, _fir_acc, _atan2_poly, _PI, _ATAN_COEFFS)
    from tsl_sdr_tpu.utils.filter_design import firdes_low_pass

    fs, d, t = 1_000_000, 40, 128
    lpf = firdes_low_pass(1.0, fs, 12_500, 9_000)[:t]
    rng = np.random.default_rng(0)
    block = 16_711_680
    tr = 1024

    def atan2_nodiv(y, x):
        ya, xa = jnp.abs(y), jnp.abs(x)
        hi = jnp.maximum(ya, xa)
        z = jnp.minimum(ya, xa) * hi          # WRONG: no divide
        z2 = z * z
        p = jnp.float32(_ATAN_COEFFS[0])
        for c0 in _ATAN_COEFFS[1:]:
            p = p * z2 + jnp.float32(c0)
        base = z * p
        return jnp.where(xa > ya, base, -base)

    for c in widths:
        offsets = rng.integers(-fs // 3, fs // 3, size=c)
        ch = MultifmChain(lpf, offsets, fs, d, exact=False, backend="pallas")
        pc = PallasChain(ch.packed_plan, ch._omega_reduced, precision="high")
        plan = pc.plan
        row, cr = plan.row, plan.cr_rows
        halfcols = pc.halfcols
        nr_ch = plan.nr_channels
        iq = rng.integers(-8000, 8000, size=(pc.carry_len + block, 2),
                          dtype=np.int64).astype(np.int16)
        carry0 = pc.init_carry(iq[: pc.carry_len])
        n_rows = block * 2 // row
        grid = n_rows // tr
        blocks = jax.device_put(jnp.asarray(
            iq[pc.carry_len:].reshape(1, 2 * block)))

        w_stack, omega_row = pc.w_stack, pc.omega_row
        chunk_nnz, gspec, precision = pc._chunk_nnz, pc._gspec, pc.precision

        def body(mode, head_i16, block_i16, w_ref, om_ref, out_ref):
            trr = block_i16.shape[0]
            x = jnp.concatenate([head_i16.astype(jnp.float32),
                                 block_i16.astype(jnp.float32)])
            acc = _fir_acc(x, w_ref, tr=trr, cr=cr, precision=precision,
                           chunk_nnz=chunk_nnz, gspec=gspec)
            ar = acc[:, :halfcols]
            ai = acc[:, halfcols:2 * halfcols]
            if mode == "noroll":
                pr, pi_ = ar[:-1], ai[:-1]
                ar, ai = ar[1:], ai[1:]
                pad = jnp.zeros((1, halfcols), jnp.float32)
                ar = jnp.concatenate([pad, ar])
                ai = jnp.concatenate([pad, ai])
                pr = jnp.concatenate([pad, pr])
                pi_ = jnp.concatenate([pad, pi_])
            elif mode == "slicecat":
                pr = jnp.concatenate(
                    [ar[:-1, halfcols - nr_ch:], ar[1:, :halfcols - nr_ch]],
                    axis=1)
                pi_ = jnp.concatenate(
                    [ai[:-1, halfcols - nr_ch:], ai[1:, :halfcols - nr_ch]],
                    axis=1)
                pad = jnp.zeros((1, halfcols), jnp.float32)
                pr = jnp.concatenate([pad, pr])
                pi_ = jnp.concatenate([pad, pi_])
            else:
                lane = jax.lax.broadcasted_iota(
                    jnp.int32, (trr + 1, halfcols), 1)
                first = lane < nr_ch

                def prev_of(a):
                    rolled = pltpu.roll(a, nr_ch, axis=1)
                    from_prev_row = pltpu.roll(rolled, 1, axis=0)
                    return jnp.where(first, from_prev_row, rolled)

                pr, pi_ = prev_of(ar), prev_of(ai)
            sre = ar * pr + ai * pi_
            sim = ai * pr - ar * pi_
            if mode == "noatan":
                phi = sim * sre
            elif mode == "nodiv":
                phi = atan2_nodiv(sim, sre)
            else:
                phi = _atan2_poly(sim, sre)
            phi = phi + om_ref[0][None, :]
            phi = jnp.where(phi > _PI, phi - 2 * _PI, phi)
            phi = jnp.where(phi <= -_PI, phi + 2 * _PI, phi)
            phi = jnp.where((sre == 0) & (sim == 0), jnp.float32(0), phi)
            pcm = jnp.trunc(phi / _PI * jnp.float32(q14.Q14_ONE)).astype(
                jnp.int16)
            out_ref[:] = pcm[1:]

        for mode in ("base", "noatan", "nodiv", "noroll", "slicecat"):
            def kernel(xc_ref, xa_ref, carry_ref, w_ref, om_ref, out_ref,
                       _mode=mode):
                i = pl.program_id(0)
                head_prev = xc_ref[tr - 1 - cr:]
                head = jnp.where(i == 0, carry_ref[:], head_prev)
                body(_mode, head, xa_ref[:], w_ref, om_ref, out_ref)

            @jax.jit
            def call(block_rows, carry_rows, _k=kernel):
                return pl.pallas_call(
                    _k, grid=(grid,),
                    in_specs=[
                        pl.BlockSpec((tr, row),
                                     lambda i: (jnp.maximum(i - 1, 0), 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((tr, row), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec(memory_space=pltpu.VMEM),
                        pl.BlockSpec(memory_space=pltpu.VMEM),
                        pl.BlockSpec(memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((tr, halfcols), lambda i: (i, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((grid * tr, halfcols),
                                                   jnp.int16),
                )(block_rows, block_rows, carry_rows, w_stack, omega_row)

            def step(carry, bv, _call=call):
                br = bv.reshape(-1, row)
                out = _call(br, carry)
                new_carry = jax.lax.dynamic_slice_in_dim(
                    br, n_rows - pc.carry_rows, pc.carry_rows)
                return new_carry, out

            try:
                r = _rate(step, carry0, blocks, block)
                us = (tr * row / 2) / (r * 1e6) * 1e6
                print(f"{c}ch {mode:8s}: {r:,.0f} Msps ({us:.2f} us/tile)",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{c}ch {mode}: FAILED {type(e).__name__}: {e}"[:250],
                      flush=True)


if __name__ == "__main__":
    widths = [int(a) for a in sys.argv[1:]] or [8, 64]
    main(widths)
