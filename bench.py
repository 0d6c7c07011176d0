#!/usr/bin/env python3
"""Headline benchmark: wideband complex IQ Msamples/s/chip through the
flagship channelize + FM-demod chain (8 channels, 128 taps, decimate-by-40 —
the etc/multifm.json shape), production tier, on the real TPU.

Baseline: a single-thread C implementation of the same per-output arithmetic
(the reference's scalar design point), compiled and timed on this host.

Timing methodology (the device sits behind an async tunnel, so naive
block_until_ready timing is unreliable):
* the rep loop runs ON DEVICE as a ``lax.scan`` whose carry threads the
  streaming state through every rep — no rep can be elided or hoisted
  (each depends on the previous state), and the PCM of every rep folds
  into a checksum that is fetched to the host;
* per-rep time is the difference between a long and a short run
  ((T(hi) - T(lo)) / (hi - lo)), cancelling dispatch/transfer overhead;
* best of several trials is reported to shed co-tenant noise.

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
REP_LO, REP_HI = 2, 10
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
    from tsl_sdr_tpu.utils.filter_design import firdes_low_pass

    lpf = firdes_low_pass(1.0, FS, 12_500, 9_000)[:NR_TAPS]
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
    samples_per_pass = N_BLOCKS * BLOCK

    def make(reps):
        @jax.jit
        def run(state, blocks):
            def rep(carry, _):
                st, acc = carry
                st, pcm = jax.lax.scan(chain._step_raw, st, blocks)
                return (st, acc + jnp.sum(pcm.astype(jnp.int32))), None

            (st, acc), _ = jax.lax.scan(
                rep, (state, jnp.int32(0)), None, length=reps
            )
            # consume all state leaves so nothing dead-codes away
            tot = acc.astype(jnp.float32)
            for leaf in jax.tree.leaves(st):
                tot = tot + jnp.sum(leaf.astype(jnp.float32))
            return tot

        return run

    run_lo, run_hi = make(REP_LO), make(REP_HI)
    float(run_lo(state0, blocks))  # compile
    float(run_hi(state0, blocks))

    def trial():
        t0 = time.perf_counter()
        float(run_lo(state0, blocks))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(run_hi(state0, blocks))
        t_hi = time.perf_counter() - t0
        dt = (t_hi - t_lo) / (REP_HI - REP_LO)
        if dt <= 0:
            return None
        return samples_per_pass / dt / 1e6

    return trial


def tpu_trials() -> dict:
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
    print(f"per-backend trial Msps: {results}", file=sys.stderr)
    return results


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
    trials = tpu_trials()
    all_rates = [r for rs in trials.values() for r in rs]
    tpu = max(all_rates)
    try:
        cpu = cpu_baseline_msps()
    except Exception as e:  # noqa: BLE001
        print(f"cpu baseline failed: {e}", file=sys.stderr)
        cpu = float("nan")
    ratio = tpu / cpu if cpu == cpu and cpu > 0 else None
    best_backend = max(trials, key=lambda b: max(trials[b], default=0.0))
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
                "median": round(statistics.median(trials[best_backend]), 2),
                "trials_msps": trials,
                "backend": best_backend,
            }
        )
    )


if __name__ == "__main__":
    main()
