#!/usr/bin/env python3
"""Randomized fused-vs-host ReceivePipeline soak (CPU).

Random channel mixes (pocsag/flex/ais) at a decimation that forces real
resampler ratios for every protocol (channel rate 51200: POCSAG 3/4,
FLEX 5/16, AIS 15/16); the fused streaming engine must produce the same
messages as the stage-by-stage host path. Signals are sized to fit the
capture — a burst truncated by EOF legitimately decodes differently
between paths (their tails end samples apart).

Usage: python bench/soak_pipeline.py [n_seeds]
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tsl_sdr_tpu.models.pipeline import ChannelSpec, ReceivePipeline  # noqa: E402
from tsl_sdr_tpu.testing import ais_gen, flex_gen, pocsag_gen  # noqa: E402
from tsl_sdr_tpu.utils.filter_design import firdes_low_pass  # noqa: E402

DECIM = 24
FS = 51200 * DECIM
CENTER = 929_500_000


def _fm_mod(baseband, channel_rate, offset, fs, amp=9000, dev_hz=None):
    dev = baseband.astype(np.float64) / 16384.0 * (
        dev_hz if dev_hz is not None else channel_rate / 2
    )
    n_out = int(len(dev) * fs / channel_rate)
    idx = np.minimum(
        (np.arange(n_out) * channel_rate / fs).astype(np.int64), len(dev) - 1
    )
    inst = 2 * np.pi * (offset + dev[idx]) / fs
    phase = np.cumsum(inst)
    return np.stack([np.cos(phase), np.sin(phase)], -1) * amp


def _signal(rng, proto, off):
    if proto == "pocsag":
        bb = pocsag_gen.generate(
            [pocsag_gen.PocsagBurst(capcode=int(rng.integers(1, 2**20)),
                                    function=1, kind="alpha",
                                    content="SOAK %d" % off)],
            baud=int(rng.choice([512, 1200, 2400])), tail_bits=128)
        return _fm_mod(bb, 38400, off, FS)
    if proto == "flex":
        bb, _ = flex_gen.generate(
            [flex_gen.FlexBurstMessage(capcode=int(rng.integers(1, 2**20)),
                                       kind="alnum", content="SOAK FLEX")],
            baud=1600, fsk_levels=2, amplitude=6144, tail_bits=200)
        return _fm_mod(bb, 16000, off, FS, amp=7000)
    bb = ais_gen.generate(
        [ais_gen.make_position_report(366000000 + int(rng.integers(1000)))],
        amplitude=9000)
    return _fm_mod(bb, 48000, off, FS, amp=7000, dev_hz=4800)


def _keys(results):
    out = []
    for msgs in results:
        ch = []
        for m in (msgs if isinstance(msgs, list) else []):
            if hasattr(m, "capcode"):
                ch.append(("pg", m.capcode, bytes(m.data)))
            elif hasattr(m, "mmsi"):
                ch.append(("ais", m.mmsi))
        out.append(ch)
    return out


def main(n_seeds=5, exact=False):
    lpf = firdes_low_pass(1.0, FS, 12_000, 8_000)
    fails = 0
    for seed in range(n_seeds):
        rng = np.random.default_rng(1000 + seed)
        nch = int(rng.integers(2, 4))
        protos = [str(p) for p in rng.choice(["pocsag", "flex", "ais"],
                                             size=nch)]
        offs = [int(o) for o in rng.choice(
            np.arange(-500_000, 500_001, 100_000), size=nch, replace=False)]
        sigs = [_signal(rng, p, o) for p, o in zip(protos, offs)]
        n = max(len(s) for s in sigs) + 600_000
        iq = np.zeros((n, 2))
        for s in sigs:
            start = int(rng.integers(100_000, n - len(s) - 100_000))
            iq[start : start + len(s)] += s
        iq = (iq + rng.normal(scale=100, size=iq.shape)).astype(np.int16)

        specs = [ChannelSpec(CENTER + o, p) for p, o in zip(protos, offs)]
        pipe = ReceivePipeline(lpf, CENTER, FS, DECIM, specs, exact=exact,
                               block_size=393_216)
        want = _keys(pipe._process_capture_host(iq, device_decode=False))
        pipe2 = ReceivePipeline(lpf, CENTER, FS, DECIM, specs, exact=exact,
                                block_size=393_216)
        if exact:
            # streaming exact engine at randomized push split points
            got_l = [[] for _ in specs]
            i0 = 0
            while i0 < len(iq):
                ln = int(rng.integers(50_000, 400_000))
                for c, part in enumerate(pipe2.push(iq[i0 : i0 + ln])):
                    got_l[c].extend(part)
                i0 += ln
            for c, part in enumerate(pipe2.flush()):
                got_l[c].extend(part)
            got = _keys(got_l)
            label = "exact-stream"
        else:
            got = _keys(pipe2.process_capture(iq))
            label = "fused"
        n_got = sum(len(c) for c in got)
        n_want = sum(len(c) for c in want)
        ok = got == want and n_want > 0
        fails += 0 if ok else 1
        print(f"seed {seed}: {protos} -> {label} {n_got}, host {n_want} "
              f"[{'OK' if ok else 'DIFF'}]", flush=True)
        if not ok:
            print(f"  {label}:", got, "\n  host:", want, flush=True)
    print("fails:", fails)
    return 1 if fails else 0


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if a != "--exact"]
    sys.exit(main(int(argv[0]) if argv else 5,
                  exact="--exact" in sys.argv[1:]))
