#!/usr/bin/env python3
"""Parts lab v2: isolate the fused chain's DMA ceiling (run on TPU).

v1 finding: a copy-only kernel at the production tiling runs ~17 us/tile
(~150 GB/s effective vs 819 GB/s HBM spec) and the FIR matmul adds ~0 at
8ch — the kernel is INPUT-DMA-bound. Variants here separate the causes:

  out    — no stream input at all: writes a constant tile (output DMA +
           grid overhead only)
  one    — input bound ONCE, no halo, no carry (single-stream DMA)
  two    — input bound TWICE like the shipped kernel (double-fetch cost)
  scr    — input bound once + halo carried in VMEM scratch across grid
           steps (TPU grids run sequentially, so program i can leave its
           last rows for program i+1) — the candidate production fix
  scrfir — scr + the real FIR matmul stack (no FM)
  scrful — scr + FIR + FM section == candidate v3 production kernel

Each at tile_rows 1024 and 2048, 8 and 64 channels.
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


def main(widths, tiles):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from tsl_sdr_tpu.models.channelizer import MultifmChain
    from tsl_sdr_tpu.ops.pallas_chain import (
        PallasChain, _fir_acc, _chain_body)
    from tsl_sdr_tpu.utils.filter_design import firdes_low_pass

    fs, d, t = 1_000_000, 40, 128
    lpf = firdes_low_pass(1.0, fs, 12_500, 9_000)[:t]
    rng = np.random.default_rng(0)
    block = 16_711_680  # 52224 rows

    for c in widths:
        offsets = rng.integers(-fs // 3, fs // 3, size=c)
        ch = MultifmChain(lpf, offsets, fs, d, exact=False, backend="pallas")
        pc = PallasChain(ch.packed_plan, ch._omega_reduced, precision="high")
        plan = pc.plan
        row, cr = plan.row, plan.cr_rows
        halfcols = pc.halfcols
        iq = rng.integers(-8000, 8000, size=(pc.carry_len + block, 2),
                          dtype=np.int64).astype(np.int16)
        carry0 = pc.init_carry(iq[: pc.carry_len])
        n_rows = block * 2 // row
        blocks = jax.device_put(jnp.asarray(
            iq[pc.carry_len:].reshape(1, 2 * block)))

        for tr in tiles:
            if n_rows % tr:
                continue
            grid = n_rows // tr

            def report(label, msps):
                per_tile = (tr * row / 2) / (msps * 1e6) * 1e6 \
                    if msps == msps else float("nan")
                print(f"{c}ch {label:6s} tr={tr}: {msps:,.0f} Msps "
                      f"({per_tile:.2f} us/tile)", flush=True)

            out_spec = pl.BlockSpec((tr, halfcols), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)
            out_shape = jax.ShapeDtypeStruct((grid * tr, halfcols), jnp.int16)
            in_tile = pl.BlockSpec((tr, row), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)
            in_prev = pl.BlockSpec((tr, row), lambda i: (jnp.maximum(i - 1, 0), 0),
                                   memory_space=pltpu.VMEM)
            full_vmem = pl.BlockSpec(memory_space=pltpu.VMEM)

            # ---- out: constant write, no stream input ----
            # every kernel consumes the CARRY (carry_ref) so XLA cannot
            # hoist the pallas_call out of the rep loop (CLAUDE.md LICM)
            def out_kernel(carry_ref, out_ref):
                out_ref[:] = jnp.full((tr, halfcols), carry_ref[0, 0],
                                      jnp.int16)

            @jax.jit
            def out_call(block_rows, carry_rows):
                return pl.pallas_call(
                    out_kernel, grid=(grid,), in_specs=[full_vmem],
                    out_specs=out_spec, out_shape=out_shape,
                )(carry_rows)

            # ---- one: single binding, no halo ----
            def one_kernel(carry_ref, xa_ref, out_ref):
                out_ref[:] = xa_ref[:, :halfcols] + carry_ref[:1, :halfcols]

            @jax.jit
            def one_call(block_rows, carry_rows):
                return pl.pallas_call(
                    one_kernel, grid=(grid,), in_specs=[full_vmem, in_tile],
                    out_specs=out_spec, out_shape=out_shape,
                )(carry_rows, block_rows)

            # ---- two: double binding like the shipped kernel ----
            def two_kernel(carry_ref, xc_ref, xa_ref, out_ref):
                out_ref[:] = (xa_ref[:, :halfcols] + xc_ref[:1, :halfcols]
                              + carry_ref[:1, :halfcols])

            @jax.jit
            def two_call(block_rows, carry_rows):
                return pl.pallas_call(
                    two_kernel, grid=(grid,),
                    in_specs=[full_vmem, in_prev, in_tile],
                    out_specs=out_spec, out_shape=out_shape,
                )(carry_rows, block_rows, block_rows)

            # ---- scr: single binding + scratch-carried halo ----
            def scr_kernel(xa_ref, carry_ref, out_ref, halo_ref):
                i = pl.program_id(0)
                head = jnp.where(i == 0, carry_ref[:], halo_ref[:])
                out_ref[:] = xa_ref[:, :halfcols] + head[:1, :halfcols]
                halo_ref[:] = xa_ref[tr - 1 - cr:]

            @jax.jit
            def scr_call(block_rows, carry_rows):
                return pl.pallas_call(
                    scr_kernel, grid=(grid,),
                    in_specs=[in_tile, full_vmem],
                    out_specs=out_spec, out_shape=out_shape,
                    scratch_shapes=[pltpu.VMEM((1 + cr, row), jnp.int16)],
                )(block_rows, carry_rows)

            # ---- scrfir / scrful: scratch halo + real compute ----
            w_stack = pc.w_stack
            omega_row = pc.omega_row
            chunk_nnz = pc._chunk_nnz
            gspec = pc._gspec
            precision = pc.precision

            def scrfir_kernel(xa_ref, carry_ref, w_ref, om_ref, out_ref,
                              halo_ref):
                i = pl.program_id(0)
                head = jnp.where(i == 0, carry_ref[:], halo_ref[:])
                x = jnp.concatenate([head.astype(jnp.float32),
                                     xa_ref[:].astype(jnp.float32)])
                acc = _fir_acc(x, w_ref, tr=tr, cr=cr, precision=precision,
                               chunk_nnz=chunk_nnz, gspec=gspec)
                out_ref[:] = (acc[1:, :halfcols]
                              + acc[1:, halfcols:2 * halfcols]).astype(jnp.int16)
                halo_ref[:] = xa_ref[tr - 1 - cr:]

            def scrful_kernel(xa_ref, carry_ref, w_ref, om_ref, out_ref,
                              halo_ref):
                i = pl.program_id(0)
                head = jnp.where(i == 0, carry_ref[:], halo_ref[:])
                _chain_body(head, xa_ref[:], w_ref, om_ref, out_ref, cr=cr,
                            halfcols=halfcols, nr_ch=plan.nr_channels,
                            precision=precision, chunk_nnz=chunk_nnz,
                            gspec=gspec)
                halo_ref[:] = xa_ref[tr - 1 - cr:]

            def mk_scr_compute(kernel):
                @jax.jit
                def call(block_rows, carry_rows):
                    return pl.pallas_call(
                        kernel, grid=(grid,),
                        in_specs=[in_tile, full_vmem, full_vmem, full_vmem],
                        out_specs=out_spec, out_shape=out_shape,
                        scratch_shapes=[pltpu.VMEM((1 + cr, row), jnp.int16)],
                    )(block_rows, carry_rows, w_stack, omega_row)

                return call

            variants = {
                "out": out_call,
                "one": one_call,
                "two": two_call,
                "scr": scr_call,
                "scrfir": mk_scr_compute(scrfir_kernel),
                "scrful": mk_scr_compute(scrful_kernel),
            }
            for label, call in variants.items():
                def step(carry, bv, _call=call):
                    br = bv.reshape(-1, row)
                    out = _call(br, carry)
                    new_carry = jax.lax.dynamic_slice_in_dim(
                        br, n_rows - pc.carry_rows, pc.carry_rows
                    ) + (carry[:1, :1] & 0)  # chain the carry dependence
                    return new_carry, out

                try:
                    report(label, _rate(step, carry0, blocks, block))
                except Exception as e:  # noqa: BLE001
                    print(f"{c}ch {label} tr={tr}: FAILED "
                          f"{type(e).__name__}: {e}"[:300], flush=True)


if __name__ == "__main__":
    widths = [int(a) for a in sys.argv[1:]] or [8, 64]
    main(widths, tiles=(1024, 2048))
