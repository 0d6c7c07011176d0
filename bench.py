#!/usr/bin/env python3
"""Headline benchmark: wideband complex IQ Msamples/s/chip through the
flagship channelize + FM-demod chain (8 channels, 128 taps, decimate-by-40 —
the etc/multifm.json shape), fast tier, on the real TPU.

Baseline: a single-thread C implementation of the same per-output arithmetic
(the reference's scalar design point), compiled and timed on this host.

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

REPO = Path(__file__).resolve().parent

NR_CHANNELS = 8
NR_TAPS = 128
DECIM = 40
FS = 1_000_000


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


def tpu_msps() -> float:
    import jax
    from tsl_sdr_tpu.models.channelizer import MultifmChain
    from tsl_sdr_tpu.utils.filter_design import firdes_low_pass

    lpf = firdes_low_pass(1.0, FS, 12_500, 9_000)[:NR_TAPS]
    rng = np.random.default_rng(0)
    offsets = rng.integers(-FS // 3, FS // 3, size=NR_CHANNELS)
    chain = MultifmChain(lpf, offsets, FS, DECIM, exact=False)

    block = 1_048_576 - (1_048_576 % DECIM)
    n_blocks = 16
    total = chain.plan.carry_len + n_blocks * block
    iq = rng.integers(-8000, 8000, size=(total, 2), dtype=np.int64).astype(np.int16)

    import jax.numpy as jnp

    state = chain.init_state(prefix=iq[: chain.plan.carry_len])
    blocks = jnp.asarray(
        iq[chain.plan.carry_len :].reshape(n_blocks, block, 2)
    )
    blocks = jax.device_put(blocks)

    # warmup / compile
    st, pcm = chain.scan_fn(state, blocks)
    jax.block_until_ready(pcm)

    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        st, pcm = chain.scan_fn(state, blocks)
    jax.block_until_ready(pcm)
    dt = (time.perf_counter() - t0) / reps
    return n_blocks * block / dt / 1e6


def main():
    tpu = tpu_msps()
    try:
        cpu = cpu_baseline_msps()
    except Exception as e:  # noqa: BLE001
        print(f"cpu baseline failed: {e}", file=sys.stderr)
        cpu = float("nan")
    ratio = tpu / cpu if cpu == cpu and cpu > 0 else None
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
            }
        )
    )


if __name__ == "__main__":
    main()
