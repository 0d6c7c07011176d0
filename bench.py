#!/usr/bin/env python3
"""Headline benchmark: wideband complex IQ Msamples/s/chip through the
flagship channelize + FM-demod chain (8 channels, 128 taps, decimate-by-40 —
the etc/multifm.json shape), production tier, on the real TPU.

Baseline: a single-thread C implementation of the same per-output arithmetic
(the reference's scalar design point), compiled and timed on this host.

Timing methodology (the device sits behind an async tunnel, so naive
block_until_ready timing is unreliable): the state-threaded differential
rep-scan harness with AUTO-CALIBRATED rep counts so each differential
window is >= ~0.5 s of device compute — see utils/benchtime.py for the
full rationale (fixes VERDICT r3 weak #2: at REP_HI=10 the window was
~100 us measured across two ~40 ms round trips, and max-of-trials
selected pure jitter artifacts). The headline ``value`` is the MEDIAN
across trials of the best backend; per-trial arrays, the best, and any
above-roofline rejected trials are recorded alongside.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Msamples/s", "vs_baseline": N}
"""

import json
import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

# persistent XLA compile cache: first compiles here are 30-160 s and every
# fresh process repays them without this
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

REPO = Path(__file__).resolve().parent

NR_CHANNELS = 8
NR_TAPS = 128
DECIM = 40
FS = 1_000_000
BLOCK = 16_711_680         # one pass (204 x 81920: XLA-quantum- AND
                           # pallas-tile-aligned so both backends take
                           # their zero-copy paths)
N_BLOCKS = 1
TRIALS = 6


def cpu_baseline_msps() -> float:
    """Compile + run the C baseline (cached binary)."""
    src = REPO / "bench" / "cpu_baseline.c"
    exe = REPO / "bench" / "cpu_baseline"
    if not exe.exists() or exe.stat().st_mtime < src.stat().st_mtime:
        subprocess.run(
            ["gcc", "-O2", "-march=native", "-o", str(exe), str(src), "-lm"],
            check=True,
        )
    out = subprocess.run(
        [str(exe), str(NR_CHANNELS), str(NR_TAPS), str(DECIM), "2000000"],
        check=True,
        capture_output=True,
        text=True,
    )
    return float(out.stdout.strip())


def _backend_prepare(backend: str):
    import jax
    import jax.numpy as jnp
    from tsl_sdr_tpu.models.channelizer import MultifmChain
    from tsl_sdr_tpu.utils import roofline
    from tsl_sdr_tpu.utils.benchtime import make_calibrated_bench

    lpf = firdes_low_pass_taps()
    rng = np.random.default_rng(0)
    offsets = rng.integers(-FS // 3, FS // 3, size=NR_CHANNELS)
    chain = MultifmChain(lpf, offsets, FS, DECIM, exact=False, backend=backend)

    total = chain.carry_len + N_BLOCKS * BLOCK
    iq = rng.integers(-8000, 8000, size=(total, 2), dtype=np.int64).astype(
        np.int16
    )
    state0 = chain.init_state(prefix=iq[: chain.carry_len])
    blocks = jax.device_put(
        jnp.asarray(iq[chain.carry_len :].reshape(N_BLOCKS, 2 * BLOCK))
    )
    bound = roofline.channelizer(NR_CHANNELS, NR_TAPS, DECIM).sol_msps
    return make_calibrated_bench(
        chain._step_raw, state0, blocks, N_BLOCKS * BLOCK,
        bound_msps=bound,
    )


def firdes_low_pass_taps():
    from tsl_sdr_tpu.utils.filter_design import firdes_low_pass

    return firdes_low_pass(1.0, FS, 12_500, 9_000)[:NR_TAPS]


def tpu_trials() -> tuple[dict, dict]:
    """Per-backend per-trial Msps, trials INTERLEAVED across backends so a
    co-tenant noise burst cannot poison one backend's whole set."""
    prepared = {}
    for backend in ("xla", "pallas", "pallas-high"):
        try:
            prepared[backend] = _backend_prepare(backend)
        except Exception as e:  # noqa: BLE001
            print(f"{backend} backend failed: {e}", file=sys.stderr)
    if not prepared:
        raise RuntimeError("all backends failed (per-backend errors above)")
    results = {b: [] for b in prepared}
    for _ in range(TRIALS):
        for b, fn in prepared.items():
            r = fn()
            if r is not None:
                results[b].append(round(r, 1))
    calib = {
        b: {
            "rep_hi": bench.rep_hi,
            "window_ms": round(bench.window_s * 1e3, 1),
            "rejected_above_bound": bench.rejected,
        }
        for b, bench in prepared.items()
    }
    print(f"per-backend trial Msps: {results}", file=sys.stderr)
    print(f"calibration: {calib}", file=sys.stderr)
    return results, calib


def _fail_json(reason: str) -> str:
    return json.dumps(
        {
            "metric": (
                "wideband IQ Msamples/s/chip through 8-channel "
                "channelize+FM demod (128 taps, decim 40)"
            ),
            "value": 0.0,
            "unit": "Msamples/s",
            "vs_baseline": None,
            "error": reason,
        }
    )


def _device_probe(timeout_s: int = 300) -> bool:
    """True iff an accelerator initializes in a throwaway process.

    The axon tunnel fails by HANGING device init, not by raising — probe in
    a subprocess so a dead tunnel yields an honest error line instead of a
    silent driver timeout with no JSON at all."""
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; d = jax.devices()[0]; print(d.platform)"],
            capture_output=True, text=True, timeout=timeout_s,
        )
        # a failed TPU init can FALL BACK to the CPU backend and still exit
        # 0 — that must not let the bench record CPU numbers as TPU results
        return r.returncode == 0 and r.stdout.strip() != "cpu"
    except subprocess.TimeoutExpired:
        return False


def main():
    import statistics
    import threading

    if not _device_probe():
        print(_fail_json("device init hung/failed (axon tunnel down); "
                         "see BENCH_SUITE.json for last good numbers"))
        return

    # mid-run hang watchdog: the tunnel can die between probe and trials
    def _die():
        print(_fail_json("bench hung mid-run (tunnel died); watchdog"),
              flush=True)
        os._exit(0)

    wd = threading.Timer(40 * 60, _die)
    wd.daemon = True
    wd.start()

    import jax

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    trials, calib = tpu_trials()
    # headline = MEDIAN of the best backend's trials (best-by-median);
    # the best single trial is recorded alongside but never quoted as the
    # result (VERDICT r3 weak #2: max-of-trials selects jitter artifacts)
    medians = {b: statistics.median(rs) for b, rs in trials.items() if rs}
    if not medians:
        print(_fail_json("all trials rejected/invalid"))
        return
    best_backend = max(medians, key=medians.get)
    tpu = medians[best_backend]
    try:
        cpu = cpu_baseline_msps()
    except Exception as e:  # noqa: BLE001
        print(f"cpu baseline failed: {e}", file=sys.stderr)
        cpu = float("nan")
    ratio = tpu / cpu if cpu == cpu and cpu > 0 else None
    rates = trials[best_backend]
    spread = max(rates) / min(rates) if min(rates) > 0 else None
    print(
        json.dumps(
            {
                "metric": (
                    "wideband IQ Msamples/s/chip through 8-channel "
                    "channelize+FM demod (128 taps, decim 40)"
                ),
                "value": round(tpu, 2),
                "unit": "Msamples/s",
                "vs_baseline": round(ratio, 2) if ratio else None,
                "best": round(max(rates), 2),
                "spread_ratio": round(spread, 2) if spread else None,
                "trials_msps": trials,
                "calibration": calib,
                "backend": best_backend,
            }
        )
    )


if __name__ == "__main__":
    main()
