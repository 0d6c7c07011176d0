#!/usr/bin/env python3
"""Round-4 resampler lab (run on the real TPU).

  python bench/r4_resampler_lab.py         # perf: XLA tier vs pallas row
  python bench/r4_resampler_lab.py check   # accuracy of bf16x4 ON HARDWARE

The XLA packed-row tier measured 7.58 Gsps = 3.0% of the 250 Gsps bound
(BENCH_SUITE r4) — the weakest roofline row on the board. The fused
packed-row pallas kernel (ops/pallas_resampler.PallasResampler) removes
the concat/pad/reshape/convert HBM round-trips; by the chain kernel's
additive model its floor is the ~100 GB/s input DMA on [TR, 200] int16
rows (~4 us/tile) + 4 bf16 MXU passes (~1.4 us) -> ~20-30 Gsps.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import numpy as np

TRIALS = 4


def _rate(step_fn, state0, blocks, samples_per_pass, bound=None):
    import statistics

    from tsl_sdr_tpu.utils.benchtime import make_calibrated_bench

    bench = make_calibrated_bench(step_fn, state0, blocks, samples_per_pass,
                                  bound_msps=bound)
    rates = [r for r in (bench() for _ in range(TRIALS)) if r is not None]
    return statistics.median(rates) if rates else float("nan")


def _mk(block_out_target=1 << 20):
    from tsl_sdr_tpu.ops import polyphase, q14
    from tsl_sdr_tpu.utils.filter_design import design_rational_resampler_filter

    coeffs = design_rational_resampler_filter(16, 25, 0.4)
    return polyphase.make_resampler_plan(
        q14.quantize_q14(coeffs), 16, 25, block_out_target=block_out_target
    )


def perf():
    import jax
    import jax.numpy as jnp
    from tsl_sdr_tpu.ops import polyphase
    from tsl_sdr_tpu.ops.pallas_resampler import PallasResampler
    from tsl_sdr_tpu.utils import roofline

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    plan = _mk()
    bound = roofline.resampler(821, 16, 25).sol_msps
    rng = np.random.default_rng(0)
    nb = 8
    x = rng.integers(-12000, 12000,
                     size=(plan.carry_len + nb * plan.block_in,),
                     dtype=np.int64).astype(np.int16)

    # --- XLA packed-row tier (the current suite row) ---
    blocks = jax.device_put(jnp.asarray(
        x[plan.carry_len:].reshape(nb, plan.block_in)))
    st0 = polyphase.init_resampler_state(plan, prefix=x[: plan.carry_len])

    def xla_step(st, blk):
        st2, out = polyphase.resample_step(plan, st, blk, exact=False)
        return st2, out.astype(jnp.int32)

    r = _rate(xla_step, st0, blocks, nb * plan.block_in, bound)
    print(f"xla packed-row      : {r:,.0f} Msps", flush=True)

    # --- pallas row kernel, tile/precision sweep ---
    row = plan.row_in
    m_total = (len(x) - row) // row
    for tr in (256, 512, 1024):
        m_per = (m_total // (nb * tr)) * tr
        if not m_per:
            continue
        n_per = m_per * row
        pb = jax.device_put(jnp.asarray(
            x[row: row + nb * n_per].reshape(nb, n_per)))
        for prec in ("high", "highest"):
            try:
                pr = PallasResampler(plan, tile_rows=tr, precision=prec)
                carry0 = pr.init_carry(x[:row])
                r = _rate(pr.step, carry0, pb, nb * n_per, bound)
                print(f"pallas tr={tr:4d} {prec:7s}: {r:,.0f} Msps",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"pallas tr={tr} {prec}: FAILED {type(e).__name__}: "
                      f"{e}"[:200], flush=True)


def check():
    """bf16x4 accuracy on REAL hardware (interpret mode cannot: it
    emulates DEFAULT-precision dots with bf16 accumulation)."""
    import jax.numpy as jnp
    from tsl_sdr_tpu.ops.pallas_resampler import PallasResampler

    plan = _mk(1 << 16)
    rng = np.random.default_rng(0)
    tr, m = 256, 1024
    row = plan.row_in
    total = rng.integers(-12000, 12000, size=((m + 1) * row,),
                         dtype=np.int64).astype(np.int16)
    w0 = plan.w_row_i16.astype(np.float64)
    w1 = plan.w_spill_i16.astype(np.float64)
    sp = w1.shape[0]
    ex = np.zeros((m, plan.k_row))
    for r_ in range(m):
        seg = total[r_ * row:(r_ + 1) * row].astype(np.float64)
        seg2 = total[(r_ + 1) * row:(r_ + 1) * row + sp].astype(np.float64)
        ex[r_] = (seg @ w0 + seg2 @ w1) / 16384.0
    for prec in ("high", "highest"):
        pr = PallasResampler(plan, tile_rows=tr, precision=prec)
        carry = pr.init_carry(total[:row])
        _, out = pr.step(carry, jnp.asarray(total[row:]))
        err = np.abs(np.asarray(out) - ex).max()
        print(f"{prec}: max |err| vs float64 oracle = {err:.6f} PCM units",
              flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "check":
        check()
    else:
        perf()
