#!/usr/bin/env python3
"""Parts lab v5: is the ~15 us/tile Pallas floor DMA LATENCY? (run on TPU)

Hypothesis from v2-v4: each HBM->VMEM block transfer on this (virtualized)
chip carries ~13-15 us of latency, and pallas_call's automatic pipelining
keeps too few in flight to hide it — split streams don't help because
they're all issued at the same depth.

Test: a kernel whose input stays in HBM (memory_space=ANY) and which DMAs
[CH, ROW] chunks into a VMEM scratch ring ITSELF, with a configurable
number of outstanding copies:

  depth1 — copy chunk, wait, consume (pure latency exposure)
  depthK — start K copies ahead before waiting (latency hidden if the
           theory holds: time/chunk -> bandwidth term only)

Chunks per grid step and chunk size are fixed (tr=1024 rows split into 4
chunks of 256 rows); only the outstanding depth varies.
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import numpy as np

TRIALS = 4
ROW = 640
N_ROWS = 52224
TR = 1024
CH = 256                      # rows per DMA chunk
CPT = TR // CH                # chunks per tile


def _rate(step_fn, state0, blocks, samples_per_pass):
    import statistics

    from tsl_sdr_tpu.utils.benchtime import make_calibrated_bench

    bench = make_calibrated_bench(step_fn, state0, blocks, samples_per_pass)
    rates = [r for r in (bench() for _ in range(TRIALS)) if r is not None]
    return statistics.median(rates) if rates else float("nan")


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    rng = np.random.default_rng(0)
    host = rng.integers(-8000, 8000, size=(N_ROWS, ROW),
                        dtype=np.int64).astype(np.int16)
    arr = jax.device_put(jnp.asarray(host.reshape(1, -1)))
    grid = N_ROWS // TR
    n_chunks_total = N_ROWS // CH

    for depth in (1, 2, 4, 8):
        nbuf = max(2, depth + 1)

        def kernel(carry_ref, x_hbm, out_ref, buf_ref, sems):
            # grid step i handles chunks [i*CPT, (i+1)*CPT)
            i = pl.program_id(0)

            def start(k):
                # chunk index k (within this step) -> global chunk g
                g = i * CPT + k
                pltpu.make_async_copy(
                    x_hbm.at[pl.ds(g * CH, CH)],
                    buf_ref.at[k % nbuf],
                    sems.at[k % nbuf],
                ).start()

            def wait(k):
                g = i * CPT + k
                pltpu.make_async_copy(
                    x_hbm.at[pl.ds(g * CH, CH)],
                    buf_ref.at[k % nbuf],
                    sems.at[k % nbuf],
                ).wait()

            for k in range(min(depth, CPT)):
                start(k)
            for k in range(CPT):
                wait(k)
                nxt = k + depth
                if nxt < CPT:
                    start(nxt)
                out_ref[pl.ds(k * CH, CH)] = (
                    buf_ref[k % nbuf][:, :128] + carry_ref[:1, :128]
                )

        @jax.jit
        def call(rows, carry):
            return pl.pallas_call(
                kernel,
                grid=(grid,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.ANY),
                ],
                out_specs=pl.BlockSpec((TR, 128), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((N_ROWS, 128), jnp.int16),
                scratch_shapes=[
                    pltpu.VMEM((nbuf, CH, ROW), jnp.int16),
                    pltpu.SemaphoreType.DMA((nbuf,)),
                ],
            )(carry, rows)

        def step(carry, bv, _call=call):
            rows = bv.reshape(N_ROWS, ROW)
            out = _call(rows, carry)
            new_carry = rows[:8] + (carry[:1, :1] & 0)
            return new_carry, out

        carry0 = jnp.zeros((8, ROW), jnp.int16)
        try:
            r = _rate(step, carry0, arr, N_ROWS * ROW // 2)
            us_tile = (TR * ROW / 2) / (r * 1e6) * 1e6
            gbs = (TR * ROW * 2 + TR * 128 * 2) / us_tile / 1e3
            print(f"depth={depth}: {r:,.0f} Msps ({us_tile:.2f} us/tile, "
                  f"{gbs:,.0f} GB/s)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"depth={depth}: FAILED {type(e).__name__}: {e}"[:300],
                  flush=True)


if __name__ == "__main__":
    main()
