#!/usr/bin/env python3
"""Parts lab v3: why does a Pallas int16 stream copy run at ~105 GB/s when
XLA elementwise int16 hits 375 GB/s (and f32 738 GB/s) on this chip?

Variants (copy kernels, calibrated-median rates, GB/s = (in+out bytes)/t):

  i16-640    — baseline: s16 [N, 640] blocks (the production layout)
  i32-320    — SAME BYTES bound as i32 [N, 320] (transport dtype test)
  f32-320    — same bytes as f32 [N, 320] (bitcast, not convert)
  i16-512    — s16 [N', 512] row width (lane-tile-aligned width test)
  i16-1280   — s16 [N'', 1280] row width (wider rows, fewer of them)

Each at tile_rows 512 / 1024 / 3072 where divisible.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import numpy as np

TRIALS = 4
TOTAL_VALUES = 52224 * 640  # one bench block of int16 values


def _rate_msps(step_fn, state0, blocks, samples_per_pass):
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
    host_i16 = rng.integers(-8000, 8000, size=TOTAL_VALUES,
                            dtype=np.int64).astype(np.int16)

    cases = [
        ("i16-640", np.int16, 640),
        ("i32-320", np.int32, 320),
        ("f32-320", np.float32, 320),
        ("i16-512", np.int16, 512),
        ("i16-1280", np.int16, 1280),
    ]
    for name, dtype, width in cases:
        vals = host_i16.view(dtype) if dtype != np.int16 else host_i16
        n_rows = vals.shape[0] // width
        arr = jax.device_put(jnp.asarray(
            vals[: n_rows * width].reshape(1, n_rows * width)))
        in_bytes = n_rows * width * np.dtype(dtype).itemsize
        for tr in (512, 1024, 3072):
            if n_rows % tr:
                continue
            grid = n_rows // tr
            ow = max(width // 8, 128)

            # the kernel MUST consume the scan carry or XLA hoists the
            # whole pallas_call out of the rep loop (CLAUDE.md LICM trap)
            def copy_kernel(st_ref, xa_ref, out_ref):
                out_ref[:] = xa_ref[:, :ow] + st_ref[0].astype(
                    jnp.dtype(dtype))

            @jax.jit
            def call(rows, st):
                return pl.pallas_call(
                    copy_kernel, grid=(grid,),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                              pl.BlockSpec((tr, width), lambda i: (i, 0),
                                           memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec((tr, ow), lambda i: (i, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((grid * tr, ow),
                                                   jnp.dtype(dtype)),
                )(st[None], rows)

            def step(st, bv):
                out = call(bv.reshape(n_rows, width), st)
                return st + jnp.int32(1), out

            try:
                r = _rate_msps(step, jnp.int32(0), arr, TOTAL_VALUES // 2)
                byts = in_bytes + grid * tr * ow * np.dtype(dtype).itemsize
                dt = (TOTAL_VALUES / 2) / (r * 1e6)
                print(f"{name} tr={tr}: {r:,.0f} Msps-equiv, "
                      f"{byts / dt / 1e9:,.0f} GB/s", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{name} tr={tr}: FAILED {type(e).__name__}: "
                      f"{e}"[:200], flush=True)


if __name__ == "__main__":
    main()
