#!/usr/bin/env python3
"""Parts lab v4: break the ~103 GB/s per-stream Pallas DMA cap by binding
the input as K parallel row-split views (run on TPU).

v3 facts: a Pallas i16 stream copy runs ~103 GB/s regardless of tile size
or row width, while the double-bound variant moves 2x the bytes in the
SAME wall time — i.e. each binding gets its own ~100 GB/s DMA stream and
streams run in parallel. If so, binding the block as K disjoint row
interleaves should multiply input bandwidth by K.

  split1 — baseline single binding [tr, ROW]
  splitK — K bindings, binding j covering tile rows [j*tr/K, (j+1)*tr/K)
           (index map i -> (i*K + j, 0) with block [tr/K, ROW])
  splitKfir / splitKful — the real FIR / full chain body fed from the K
           concatenated views (candidate production kernel v3)
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
        tr = 1024

        grid = n_rows // tr

        def report(label, msps):
            per_tile = (tr * row / 2) / (msps * 1e6) * 1e6 \
                if msps == msps else float("nan")
            print(f"{c}ch {label:10s}: {msps:,.0f} Msps "
                  f"({per_tile:.2f} us/tile)", flush=True)

        out_spec = pl.BlockSpec((tr, halfcols), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((grid * tr, halfcols), jnp.int16)
        full_vmem = pl.BlockSpec(memory_space=pltpu.VMEM)

        w_stack = pc.w_stack
        omega_row = pc.omega_row
        chunk_nnz = pc._chunk_nnz
        gspec = pc._gspec
        precision = pc.precision

        def split_specs(k):
            """K row-interleaved views: view j covers tile-i rows
            [i*tr + j*(tr/k), i*tr + (j+1)*(tr/k)) via block index
            (i*k + j) of a [tr/k, ROW] block grid."""
            return [
                pl.BlockSpec((tr // k, row),
                             functools.partial(
                                 lambda i, j=0, k=1: (i * k + j, 0),
                                 j=j, k=k),
                             memory_space=pltpu.VMEM)
                for j in range(k)
            ]

        def mk_copy(k):
            def kernel(*refs):
                carry_ref = refs[0]
                xs = refs[1: 1 + k]
                out_ref = refs[1 + k]
                parts = [x[:, :halfcols] for x in xs]
                v = jnp.concatenate(parts) if k > 1 else parts[0]
                out_ref[:] = v + carry_ref[:1, :halfcols]

            @jax.jit
            def call(block_rows, carry_rows):
                return pl.pallas_call(
                    kernel, grid=(grid,),
                    in_specs=[full_vmem] + split_specs(k),
                    out_specs=out_spec, out_shape=out_shape,
                )(carry_rows, *([block_rows] * k))

            return call

        def mk_chain(k, body):
            """K split views + the previous tile's tail view for the halo
            (bound as a small extra stream: last 1+cr rows of tile i-1 via
            a [tr/k, ROW] view at index (i*k - 1) clamped)."""
            def kernel(*refs):
                carry_ref = refs[0]
                xprev = refs[1]
                xs = refs[2: 2 + k]
                w_ref = refs[2 + k]
                om_ref = refs[3 + k]
                out_ref = refs[4 + k]
                i = pl.program_id(0)
                head_prev = xprev[tr // k - 1 - cr:]
                head = jnp.where(i == 0, carry_ref[:], head_prev)
                body(head, xs, w_ref, om_ref, out_ref)

            @jax.jit
            def call(block_rows, carry_rows):
                prev_spec = pl.BlockSpec(
                    (tr // k, row),
                    functools.partial(
                        lambda i, k=1: (jnp.maximum(i * k - 1, 0), 0), k=k),
                    memory_space=pltpu.VMEM)
                return pl.pallas_call(
                    kernel, grid=(grid,),
                    in_specs=[full_vmem, prev_spec] + split_specs(k)
                    + [full_vmem, full_vmem],
                    out_specs=out_spec, out_shape=out_shape,
                )(carry_rows, block_rows, *([block_rows] * k),
                  w_stack, omega_row)

            return call

        def fir_body(head, xs, w_ref, om_ref, out_ref):
            x = jnp.concatenate(
                [head.astype(jnp.float32)]
                + [xv[:].astype(jnp.float32) for xv in xs])
            acc = _fir_acc(x, w_ref, tr=tr, cr=cr, precision=precision,
                           chunk_nnz=chunk_nnz, gspec=gspec)
            out_ref[:] = (acc[1:, :halfcols]
                          + acc[1:, halfcols:2 * halfcols]).astype(jnp.int16)

        def full_body(head, xs, w_ref, om_ref, out_ref):
            xcat = jnp.concatenate([xv[:] for xv in xs]) if len(xs) > 1 \
                else xs[0][:]
            _chain_body(head, xcat, w_ref, om_ref, out_ref, cr=cr,
                        halfcols=halfcols, nr_ch=plan.nr_channels,
                        precision=precision, chunk_nnz=chunk_nnz,
                        gspec=gspec)

        variants = {}
        for k in (1, 2, 4):
            variants[f"split{k}"] = mk_copy(k)
        for k in (2, 4):
            variants[f"split{k}fir"] = mk_chain(k, fir_body)
            variants[f"split{k}ful"] = mk_chain(k, full_body)

        for label, call in variants.items():
            def step(carry, bv, _call=call):
                br = bv.reshape(-1, row)
                out = _call(br, carry)
                new_carry = jax.lax.dynamic_slice_in_dim(
                    br, n_rows - pc.carry_rows, pc.carry_rows
                ) + (carry[:1, :1] & 0)
                return new_carry, out

            try:
                report(label, _rate(step, carry0, blocks, block))
            except Exception as e:  # noqa: BLE001
                print(f"{c}ch {label}: FAILED {type(e).__name__}: "
                      f"{e}"[:250], flush=True)


if __name__ == "__main__":
    widths = [int(a) for a in sys.argv[1:]] or [8, 64]
    main(widths)
