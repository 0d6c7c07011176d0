#!/usr/bin/env python3
"""Decompose the fused Pallas chain's time: DMA vs MXU vs VPU (run on TPU).

The fused kernel sits at ~7-12% of the HBM speed-of-light while its per-tile
budget (input DMA + one [TR,ROW]x[ROW,2*opr*C] matmul + elementwise FM)
says ~50-100 Gsps should be attainable. This lab measures stripped-down
variants at the production tiling to locate the overhead:

  copy   — DMA in -> int16 pass-through -> DMA out (pure memory/grid cost)
  conv   — + int16->f32 convert + row-sum (adds the conversion cost)
  fir    — + the real FIR matmul stack (adds MXU cost; no FM section)
  full   — the shipped kernel (adds FM lane-roll + atan2 + wrap)

Each prints Msps at the same [rows=52224, ROW] stream shape as bench.py,
plus the implied per-tile microseconds.

Usage: python bench/pallas_parts_lab.py [nch ...]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import numpy as np

TRIALS = 4


def _rate(step_fn, state0, blocks, samples_per_pass, label):
    import statistics

    from tsl_sdr_tpu.utils.benchtime import make_calibrated_bench

    bench = make_calibrated_bench(step_fn, state0, blocks, samples_per_pass)
    rates = [r for r in (bench() for _ in range(TRIALS)) if r is not None]
    med = statistics.median(rates) if rates else float("nan")
    n_tiles = samples_per_pass  # filled by caller via closure print
    return med


def main(widths):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from tsl_sdr_tpu.models.channelizer import MultifmChain
    from tsl_sdr_tpu.ops.pallas_chain import PallasChain, _fir_acc, _chain_body
    from tsl_sdr_tpu.utils.filter_design import firdes_low_pass

    fs, d, t = 1_000_000, 40, 128
    lpf = firdes_low_pass(1.0, fs, 12_500, 9_000)[:t]
    rng = np.random.default_rng(0)
    block = 16_711_680  # 52224 rows, all tiles divide

    for c in widths:
        offsets = rng.integers(-fs // 3, fs // 3, size=c)
        ch = MultifmChain(lpf, offsets, fs, d, exact=False, backend="pallas")
        pc = PallasChain(ch.packed_plan, ch._omega_reduced, precision="high")
        plan = pc.plan
        tr, row, cr = pc.tr, plan.row, plan.cr_rows
        halfcols = pc.halfcols
        iq = rng.integers(-8000, 8000, size=(pc.carry_len + block, 2),
                          dtype=np.int64).astype(np.int16)
        carry0 = pc.init_carry(iq[: pc.carry_len])
        block_rows_np = iq[pc.carry_len:].reshape(-1, row)
        n_rows = block_rows_np.shape[0]
        grid = n_rows // tr
        blocks = jax.device_put(jnp.asarray(
            iq[pc.carry_len:].reshape(1, 2 * block)))

        us_per_tile = 1e6 * (tr * row // 2) / 1e6  # samples/tile -> us @1Gsps

        def report(label, msps):
            per_tile = (tr * row / 2) / (msps * 1e6) * 1e6 if msps == msps else float("nan")
            print(f"{c}ch {label:5s} tr={tr}: {msps:,.0f} Msps "
                  f"({per_tile:.2f} us/tile)", flush=True)

        # ---- copy kernel: same in_specs as v2, trivial body ----
        def copy_kernel(xc_ref, xa_ref, carry_ref, out_ref):
            s = jnp.sum(xa_ref[:, :halfcols].astype(jnp.int16), axis=1,
                        keepdims=True)  # touch data cheaply
            out_ref[:] = xa_ref[:, :halfcols] + (s * 0)

        @jax.jit
        def copy_call(block_rows, carry_rows):
            return pl.pallas_call(
                copy_kernel,
                grid=(grid,),
                in_specs=[
                    pl.BlockSpec((tr, row), lambda i: (jnp.maximum(i - 1, 0), 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((tr, row), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((tr, halfcols), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((grid * tr, halfcols),
                                               jnp.int16),
            )(block_rows, block_rows, carry_rows)

        # ---- conv kernel: + f32 conversion of the halo'd window ----
        def conv_kernel(xc_ref, xa_ref, carry_ref, out_ref):
            i = pl.program_id(0)
            head_prev = xc_ref[tr - 1 - cr:]
            head = jnp.where(i == 0, carry_ref[:], head_prev)
            x = jnp.concatenate([head.astype(jnp.float32),
                                 xa_ref[:].astype(jnp.float32)])
            out_ref[:] = (x[1:, :halfcols]).astype(jnp.int16)

        # ---- fir kernel: real matmul stack, skip the FM section ----
        w_stack = pc.w_stack
        omega_row = pc.omega_row
        chunk_nnz = pc._chunk_nnz
        gspec = pc._gspec
        precision = pc.precision

        def fir_kernel(xc_ref, xa_ref, carry_ref, w_ref, om_ref, out_ref):
            i = pl.program_id(0)
            head_prev = xc_ref[tr - 1 - cr:]
            head = jnp.where(i == 0, carry_ref[:], head_prev)
            x = jnp.concatenate([head.astype(jnp.float32),
                                 xa_ref[:].astype(jnp.float32)])
            acc = _fir_acc(x, w_ref, tr=tr, cr=cr, precision=precision,
                           chunk_nnz=chunk_nnz, gspec=gspec)
            ar = acc[:, :halfcols]
            ai = acc[:, halfcols:2 * halfcols]
            out_ref[:] = (ar[1:] + ai[1:]).astype(jnp.int16)

        def mk_call(kernel, with_w):
            in_specs = [
                pl.BlockSpec((tr, row), lambda i: (jnp.maximum(i - 1, 0), 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tr, row), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ]
            if with_w:
                in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM),
                             pl.BlockSpec(memory_space=pltpu.VMEM)]

            @jax.jit
            def call(block_rows, carry_rows):
                args = (block_rows, block_rows, carry_rows)
                if with_w:
                    args += (w_stack, omega_row)
                return pl.pallas_call(
                    kernel, grid=(grid,), in_specs=in_specs,
                    out_specs=pl.BlockSpec((tr, halfcols), lambda i: (i, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((grid * tr, halfcols),
                                                   jnp.int16),
                )(*args)

            return call

        variants = {
            "copy": mk_call(copy_kernel, False),
            "conv": mk_call(conv_kernel, False),
            "fir": mk_call(fir_kernel, True),
        }
        for label, call in variants.items():
            def step(carry, bv, _call=call):
                br = bv.reshape(-1, row)
                out = _call(br, carry)
                new_carry = jax.lax.dynamic_slice_in_dim(
                    br, n_rows - pc.carry_rows, pc.carry_rows)
                return new_carry, out

            try:
                r = _rate(step, carry0, blocks, block, label)
                report(label, r)
            except Exception as e:  # noqa: BLE001
                print(f"{c}ch {label}: FAILED {type(e).__name__}: {e}",
                      flush=True)

        # ---- full shipped kernel (precision high + highest) ----
        for prec in ("high", "highest"):
            pcx = PallasChain(ch.packed_plan, ch._omega_reduced,
                              precision=prec)

            def stepf(carry, bv, _p=pcx):
                return _p.step(carry, bv)

            r = _rate(stepf, carry0, blocks, block, f"full-{prec}")
            report(f"full-{prec}", r)


if __name__ == "__main__":
    widths = [int(a) for a in sys.argv[1:]] or [8, 64]
    main(widths)
