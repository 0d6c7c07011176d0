#!/usr/bin/env python3
"""Parts lab v7: make the chain's COMPUTE overlap its input DMA (run on TPU).

Facts so far (labs 3-6): input DMA is bandwidth-capped at ~100 GB/s
(depth-insensitive -> not latency), and the full-chain time is almost
exactly copy-floor + compute (8ch: 15.3 + 7.5 = 22.8 us/tile) — i.e.
pallas_call's automatic pipelining is NOT overlapping the kernel body
with the next tile's DMA here. If we can overlap, the ceiling is
max(DMA, compute): 8ch ~15.3 us/tile (21.9 Gsps), 64ch ~15.8 (20.7 Gsps).

Variants at each width:

  base    — production v2 call (pc.step) as shipped
  par     — same kernel, dimension_semantics=("parallel",)
  man<d>  — manual-DMA ring: input bound in ANY memory space, the kernel
            DMAs [CH, ROW] chunks into a VMEM ring itself with d chunks
            outstanding, and runs the REAL chain body per chunk while
            later chunks stream in. Halo head comes from the previous
            chunk still resident in the ring.
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import numpy as np

TRIALS = 4
CH = 256                       # rows per DMA chunk


def _rate(step_fn, state0, blocks, samples_per_pass):
    import statistics

    from tsl_sdr_tpu.utils.benchtime import make_calibrated_bench

    bench = make_calibrated_bench(step_fn, state0, blocks, samples_per_pass)
    rates = [r for r in (bench() for _ in range(TRIALS)) if r is not None]
    return statistics.median(rates) if rates else float("nan")


def main(widths, depths=(2, 4)):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from tsl_sdr_tpu.models.channelizer import MultifmChain
    from tsl_sdr_tpu.ops.pallas_chain import PallasChain, _chain_body
    from tsl_sdr_tpu.utils.filter_design import firdes_low_pass

    fs, d40, t = 1_000_000, 40, 128
    lpf = firdes_low_pass(1.0, fs, 12_500, 9_000)[:t]
    rng = np.random.default_rng(0)
    block = 16_711_680  # 52224 rows, divisible by all tiles
    tr = 1024
    cpt = tr // CH

    for c in widths:
        offsets = rng.integers(-fs // 3, fs // 3, size=c)
        ch = MultifmChain(lpf, offsets, fs, d40, exact=False,
                          backend="pallas")
        pc = PallasChain(ch.packed_plan, ch._omega_reduced,
                         precision="high", tile_rows=tr)
        plan = pc.plan
        row, cr = plan.row, plan.cr_rows
        halfcols = pc.halfcols
        iq = rng.integers(-8000, 8000, size=(pc.carry_len + block, 2),
                          dtype=np.int64).astype(np.int16)
        carry0 = pc.init_carry(iq[: pc.carry_len])
        n_rows = block * 2 // row
        blocks = jax.device_put(jnp.asarray(
            iq[pc.carry_len:].reshape(1, 2 * block)))
        grid = n_rows // tr

        def report(label, msps):
            per_tile = (tr * row / 2) / (msps * 1e6) * 1e6 \
                if msps == msps else float("nan")
            print(f"{c}ch {label:8s}: {msps:,.0f} Msps "
                  f"({per_tile:.2f} us/tile)", flush=True)

        def run_step(call):
            def step(carry, bv, _call=call):
                br = bv.reshape(-1, row)
                out = _call(br, carry)
                new_carry = jax.lax.dynamic_slice_in_dim(
                    br, n_rows - pc.carry_rows, pc.carry_rows
                ) + (carry[:1, :1] & 0)
                return new_carry, out
            return step

        # ---- base: production path --------------------------------------
        report("base", _rate(pc.step, carry0, blocks, block))

        # ---- par: v2 kernel + parallel dimension semantics ---------------
        body = functools.partial(
            _chain_body, cr=cr, halfcols=halfcols,
            nr_ch=plan.nr_channels, precision=pc.precision,
            chunk_nnz=pc._chunk_nnz, gspec=pc._gspec,
            approx_div=pc.approx_div)

        def v2_kernel(xc_ref, xa_ref, carry_ref, w_ref, om_ref, out_ref):
            i = pl.program_id(0)
            head_prev = xc_ref[tr - 1 - cr:]
            head = jnp.where(i == 0, carry_ref[:], head_prev)
            body(head, xa_ref[:], w_ref, om_ref, out_ref)

        @jax.jit
        def call_par(block_rows, carry_rows):
            return pl.pallas_call(
                v2_kernel, grid=(grid,),
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
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",)),
            )(block_rows, block_rows, carry_rows, pc.w_stack, pc.omega_row)

        try:
            report("par", _rate(run_step(call_par), carry0, blocks, block))
        except Exception as e:  # noqa: BLE001
            print(f"{c}ch par: FAILED {type(e).__name__}: {e}"[:250],
                  flush=True)

        # ---- man<d>: manual-DMA ring + real chain body --------------------
        for depth in depths:
            nbuf = depth + 2

            def man_kernel(carry_ref, x_hbm, w_ref, om_ref, out_ref,
                           buf_ref, head_buf, sems, *, depth=depth,
                           nbuf=nbuf):
                i = pl.program_id(0)

                def start(k):
                    g = i * cpt + k
                    pltpu.make_async_copy(
                        x_hbm.at[pl.ds(g * CH, CH)],
                        buf_ref.at[k % nbuf],
                        sems.at[k % nbuf],
                    ).start()

                def wait(k):
                    g = i * cpt + k
                    pltpu.make_async_copy(
                        x_hbm.at[pl.ds(g * CH, CH)],
                        buf_ref.at[k % nbuf],
                        sems.at[k % nbuf],
                    ).wait()

                for k in range(min(depth, cpt)):
                    start(k)
                for k in range(cpt):
                    wait(k)
                    nxt = k + depth
                    if nxt < cpt:
                        start(nxt)
                    if k == 0:
                        # head persisted by the previous program in the
                        # head scratch (survives grid steps: the TPU grid
                        # is sequential); program 0 takes the stream carry
                        head = jnp.where(i == 0, carry_ref[:],
                                         head_buf[:])
                    else:
                        # chunk k-1's slot is not recycled until chunk
                        # k-1+nbuf, whose start is issued at k+1 or later
                        # (nbuf == depth+2)
                        head = buf_ref[(k - 1) % nbuf][CH - 1 - cr:]
                    body(head, buf_ref[k % nbuf],
                         w_ref, om_ref, out_ref.at[pl.ds(k * CH, CH)])
                    if k == cpt - 1:
                        head_buf[:] = buf_ref[k % nbuf][CH - 1 - cr:]

            @jax.jit
            def call_man(block_rows, carry_rows, _kern=man_kernel,
                         _nbuf=nbuf):
                return pl.pallas_call(
                    _kern, grid=(grid,),
                    in_specs=[
                        pl.BlockSpec(memory_space=pltpu.VMEM),
                        pl.BlockSpec(memory_space=pl.ANY),
                        pl.BlockSpec(memory_space=pltpu.VMEM),
                        pl.BlockSpec(memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((tr, halfcols),
                                           lambda i: (i, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((grid * tr, halfcols),
                                                   jnp.int16),
                    scratch_shapes=[
                        pltpu.VMEM((_nbuf, CH, row), jnp.int16),
                        pltpu.VMEM((1 + cr, row), jnp.int16),
                        pltpu.SemaphoreType.DMA((_nbuf,)),
                    ],
                )(carry_rows, block_rows, pc.w_stack, pc.omega_row)

            try:
                r = _rate(run_step(call_man), carry0, blocks, block)
                report(f"man{depth}", r)
            except Exception as e:  # noqa: BLE001
                print(f"{c}ch man{depth}: FAILED {type(e).__name__}: "
                      f"{e}"[:250], flush=True)

        # correctness spot-check for the manual kernel (depth=last)
        try:
            ref = pc.step(carry0, blocks[0])[1]
            got = run_step(call_man)(carry0, blocks[0])[1]
            ok = bool(jnp.array_equal(ref, got))
            print(f"{c}ch man matches production: {ok}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{c}ch man check FAILED: {e}"[:250], flush=True)


if __name__ == "__main__":
    widths = [int(a) for a in sys.argv[1:]] or [8, 64]
    main(widths)
