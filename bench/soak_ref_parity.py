"""Randomized decoder-parity soak vs the COMPILED reference C.

Extends the fixed-seed noise-path parity tests (tests/test_ref_parity.py::
test_noise_path_parity_all_protocols) to arbitrary seeds: every round draws
random noise levels, burst amplitudes, message contents, and refc block
sizes, then diffs all three framework tiers (scalar python, vectorized,
native C++ FSM) message-for-message — junk included — against the running
unmodified reference (pager_pocsag.c / pager_flex.c / ais_demod.c compiled
under testing/refc).

Usage: python bench/soak_ref_parity.py [n_seeds] [--start SEED0]
Exit 0 iff every seed/protocol/tier matched.
"""

from __future__ import annotations

import string
import sys

import numpy as np

from tsl_sdr_tpu.testing import ais_gen, flex_gen, pocsag_gen, refc

_FLEX_PHASE_INDEX = {"A": 0, "B": 1, "C": 2, "D": 3}
_FLEX_KIND = {"alnum": "alnum", "numeric": "num", "siv": "siv"}


def _noise_plus(r, sig, noise, n_pre, n_post=20_000):
    parts = [
        r.integers(-noise, noise, size=n_pre, dtype=np.int64).astype(np.int16),
        np.clip(sig.astype(np.int32)
                + r.normal(scale=noise * 0.55, size=sig.shape),
                -32768, 32767).astype(np.int16),
        r.integers(-noise, noise, size=n_post,
                   dtype=np.int64).astype(np.int16),
    ]
    return np.concatenate(parts)


def _text(r, n):
    alpha = string.ascii_uppercase + string.digits + " "
    return "".join(alpha[i] for i in r.integers(0, len(alpha), size=n))


def soak_pocsag(r, block):
    from tsl_sdr_tpu.models.pocsag import PocsagDecoder

    baud = int(r.choice([512, 1200, 2400]))
    kind = "alpha" if r.random() < 0.6 else "numeric"
    content = (_text(r, int(r.integers(1, 18))) if kind == "alpha" else
               "".join(map(str, r.integers(0, 10, size=8))))
    burst = pocsag_gen.generate(
        [pocsag_gen.PocsagBurst(
            capcode=int(r.integers(1, 1 << 21)),
            function=int(r.integers(0, 4)),
            kind=kind, content=content)],
        baud=baud, amplitude=int(r.integers(2500, 9000)),
        tail_bits=int(r.integers(16, 300)))
    pcm = _noise_plus(r, burst, int(r.integers(4000, 22000)),
                      int(r.integers(30_000, 160_000)))
    ref = [(m.kind, m.baud, m.capcode, m.function, m.data)
           for m in refc.pocsag_run(pcm, block=block)]
    for dec in (PocsagDecoder(native=False, vectorized=False),
                PocsagDecoder(native=False), PocsagDecoder()):
        got = [(m.kind, m.baud, m.capcode, m.function, m.data)
               for m in dec.on_pcm(pcm)]
        if got != ref:
            return f"POCSAG tier {dec!r}: {got} != ref {ref}"
    return None


def soak_flex(r, block):
    from tsl_sdr_tpu.models.flex import FlexDecoder

    baud, fsk = [(1600, 2), (3200, 2), (3200, 4), (6400, 4)][
        int(r.integers(0, 4))]
    kind = "alnum" if r.random() < 0.7 else "numeric"
    content = (_text(r, int(r.integers(1, 16))) if kind == "alnum" else
               "".join(map(str, r.integers(0, 10, size=6))))
    burst, _ = flex_gen.generate(
        [flex_gen.FlexBurstMessage(
            # short address = capcode + 32768 in (0x8000, 0x1E0000]
            capcode=int(r.integers(1, 0x1D8001)),
            kind=kind, content=content)],
        baud=baud, fsk_levels=fsk,
        amplitude=int(r.integers(3500, 9000)),
        tail_bits=int(r.integers(16, 200)))
    pcm = _noise_plus(r, burst, int(r.integers(3000, 15000)),
                      int(r.integers(30_000, 120_000)))
    ref = [(m.kind, m.baud, m.phase, m.capcode, m.data)
           for m in refc.flex_run(pcm, block=block)]
    for dec in (FlexDecoder(native=False, vectorized=False),
                FlexDecoder(native=False), FlexDecoder()):
        got = [(_FLEX_KIND[m.kind], m.baud, _FLEX_PHASE_INDEX[m.phase],
                m.capcode, m.data) for m in dec.on_pcm(pcm)]
        if got != ref:
            return f"FLEX {baud}/{fsk} tier {dec!r}: {got} != ref {ref}"
    return None


def soak_ais(r, block):
    from tsl_sdr_tpu.models.ais import AisDemodulator

    sig = ais_gen.generate(
        [ais_gen.make_position_report(
            int(r.integers(100_000_000, 999_999_999)),
            longitude=float(r.uniform(-179, 179)),
            latitude=float(r.uniform(-89, 89)))],
        amplitude=int(r.integers(3000, 9000)))
    pcm = _noise_plus(r, sig, int(r.integers(5000, 26000)),
                      int(r.integers(30_000, 140_000)))
    ref_pk = [p for p, ok in refc.ais_demod_run(pcm, block=block) if ok]
    for d in (AisDemodulator(native=False, vectorized=False),
              AisDemodulator(native=False), AisDemodulator()):
        d.on_pcm(pcm)
        if d.packets != ref_pk:
            return f"AIS tier {d!r}: {len(d.packets)} pkts != ref {len(ref_pk)}"
    return None


def main(n_seeds=25, start=0):
    assert refc.available(), "reference tree unavailable"
    refc.load()
    fails = 0
    for seed in range(start, start + n_seeds):
        r = np.random.default_rng(1_000_000 + seed)
        block = int(r.choice([256, 1024, 4096, 16384]))
        msgs = []
        for fn in (soak_pocsag, soak_flex, soak_ais):
            err = fn(r, block)
            if err:
                msgs.append(err)
        ok = not msgs
        fails += 0 if ok else 1
        print(f"seed {seed} (block {block}): {'OK' if ok else msgs}",
              flush=True)
    print("fails:", fails)
    return 1 if fails else 0


if __name__ == "__main__":
    argv = sys.argv[1:]
    start = 0
    if "--start" in argv:
        i = argv.index("--start")
        start = int(argv[i + 1])
        del argv[i : i + 2]
    sys.exit(main(int(argv[0]) if argv else 25, start))
