#!/usr/bin/env python3
"""Generate the committed replay fixtures (VERDICT r3 next-round #7).

The reference's integration anchors are real off-air captures
(``/root/reference/pager/test/test_mueller_muller.c:92-124``,
``pager/test/test_pager_pocsag.c:253-262``, ``ais/test/test_ais_demod.c:458``)
that ship in neither repo. These stand-ins are synthesized at
capture-realism — NBFM-modulated onto a wideband carrier with oscillator
error (CFO), sample-rate offset and Gaussian noise, then received through
the REAL channelizer chain (MultifmChain) back down to channel-rate PCM —
so the replay tests exercise the same full path a recorded capture would,
and stop auto-skipping.

Every fixture is VERIFIED at generation time (the script asserts the exact
property its test asserts) and is deterministic (fixed seeds), so a
regenerated file is byte-identical.

Run from the repo root:  python tests/fixtures/make_replay_fixtures.py
"""

import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
os.environ["JAX_PLATFORMS"] = "cpu"
# the axon site hook re-forces JAX_PLATFORMS at import; honoring cpu needs
# the config set BEFORE device init (CLAUDE.md) — without this the script
# silently grabs the TPU and fights any benchmark running there
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

OUT = Path(__file__).resolve().parent / "replay"


def _fm_mod(baseband, channel_rate, offset, fs, amp=9000, dev_hz=None,
            cfo_hz=0.0, sro_ppm=0.0):
    """NBFM-modulate channel-rate PCM onto ``offset`` at wideband ``fs``
    with transmitter CFO and sample-rate error (same channel model as
    tests/test_impairments.py)."""
    dev = baseband.astype(np.float64) / 16384.0 * (
        dev_hz if dev_hz is not None else channel_rate / 2
    )
    rate = channel_rate * (1.0 + sro_ppm * 1e-6)
    n_out = int(len(dev) * fs / rate)
    idx = np.minimum((np.arange(n_out) * rate / fs).astype(np.int64),
                     len(dev) - 1)
    phase = np.cumsum(2 * np.pi * (offset + cfo_hz + dev[idx]) / fs)
    return np.stack([np.cos(phase), np.sin(phase)], -1) * amp


def _receive(iq_f, fs, decim, offset, cutoff, trans, noise_rms, seed):
    """Wideband float IQ -> real channelizer chain -> channel-rate PCM."""
    from tsl_sdr_tpu.models.channelizer import MultifmChain
    from tsl_sdr_tpu.utils.filter_design import firdes_low_pass

    rng = np.random.default_rng(seed)
    iq = np.clip(iq_f + rng.normal(scale=noise_rms, size=iq_f.shape),
                 -32768, 32767).astype(np.int16)
    chain = MultifmChain(firdes_low_pass(1.0, fs, cutoff, trans),
                         [offset], fs, decim, exact=False)
    return np.asarray(chain.process_array(iq)[0], dtype=np.int16)


def make_pocsag_512bps():
    """512-baud POCSAG capture at 38400 Hz channel rate (the rate/baud of
    the reference's pocsag_38400_test_512bps_hackrf.raw)."""
    from tsl_sdr_tpu.models.pocsag import PocsagDecoder
    from tsl_sdr_tpu.testing import pocsag_gen

    decim = 32
    fs = 38400 * decim
    offset = 150_000
    bursts = [
        pocsag_gen.PocsagBurst(capcode=1122334, function=0, kind="alpha",
                               content="REPLAY FIXTURE 512"),
        pocsag_gen.PocsagBurst(capcode=654321, function=2, kind="numeric",
                               content="0123456789"),
    ]
    bb = pocsag_gen.generate(bursts, baud=512, amplitude=6000, tail_bits=64)
    pad = np.zeros(12_000, np.int16)
    bb = np.concatenate([pad, bb, pad])
    iq = _fm_mod(bb, 38400, offset, fs, amp=8000, dev_hz=4500,
                 cfo_hz=180.0, sro_ppm=35.0)
    pcm = _receive(iq, fs, decim, offset, 9_600, 7_000,
                   noise_rms=350.0, seed=101)
    msgs = PocsagDecoder().scan(pcm)
    caps = {m.capcode for m in msgs}
    assert {1122334, 654321} <= caps, msgs
    assert all(m.baud == 512 for m in msgs), msgs
    (OUT / "synthetic_pocsag_38400_512bps.raw").write_bytes(pcm.tobytes())
    print(f"pocsag 512bps: {len(pcm)} samples, {len(msgs)} msgs")


def make_mm_anchor():
    """25 kHz discriminator PCM whose MM decision stream contains EXACTLY
    nine 9-sync-word detections under the reference's loop constants — the
    equivalent of test_mueller_muller.c:180-211's anchor on
    pocsag_hospital_25khz_long.raw (kw=1e-4, km=4e-6, 25000/1200 s/bit,
    hamming<4 vs 0x7CD215D8)."""
    from tsl_sdr_tpu.ops.mueller_muller import MuellerMuller
    from tsl_sdr_tpu.testing import pocsag_gen

    # 9 batches -> 9 on-air sync words; receive at 25 kHz via the real
    # chain (non-integer 20.83 samples/bit exercises the timing loop the
    # way the real capture does)
    bursts = [
        pocsag_gen.PocsagBurst(capcode=200000 + 8 * k, function=1,
                               kind="alpha",
                               content=f"HOSPITAL PAGE {k:02d}")
        for k in range(9)
    ]
    bb = pocsag_gen.generate(bursts, baud=1200, amplitude=6000, tail_bits=32)
    n_batches = (len(pocsag_gen.build_words(bursts)) + 15) // 16
    assert n_batches == 9, n_batches

    decim = 32
    fs_tx = 38400 * decim
    offset = 200_000
    pad = np.zeros(6_000, np.int16)
    iq = _fm_mod(np.concatenate([pad, bb, pad]), 38400, offset, fs_tx,
                 amp=8000, dev_hz=4500, cfo_hz=-120.0, sro_ppm=-20.0)
    pcm38 = _receive(iq, fs_tx, decim, offset, 9_600, 7_000,
                     noise_rms=300.0, seed=202)
    # resample 38400 -> 25000 the way a 25 kHz SDR channel would sample the
    # same discriminator output (linear interp is fine for audio-domain FM)
    t25 = np.arange(int(len(pcm38) * 25000 / 38400)) * (38400 / 25000)
    i0 = np.minimum(t25.astype(np.int64), len(pcm38) - 2)
    fr = t25 - i0
    pcm = ((1 - fr) * pcm38[i0] + fr * pcm38[i0 + 1]).astype(np.int16)

    spb = np.float32(25000.0) / np.float32(1200.0)
    mm = MuellerMuller(kw=1e-4, km=4e-6, samples_per_bit=spb,
                       error_min=spb - 0.05, error_max=spb + 0.05)
    decisions = mm.process(pcm)
    word, count = 0, 0
    for s in decisions:
        word = ((word << 1) | (0 if s > 0 else 1)) & 0xFFFFFFFF
        if bin(word ^ 0x7CD215D8).count("1") < 4:
            count += 1
    assert count == 9, f"MM sync count {count} != 9"
    (OUT / "synthetic_pocsag_25khz_9sync.raw").write_bytes(pcm.tobytes())
    print(f"mm anchor: {len(pcm)} samples, 9 sync words verified")


def make_ais_48khz():
    """AIS 48 kHz discriminator capture: NRZI/GMSK baseband from ais_gen,
    modulated to wideband, received through the chain, decoded back."""
    from tsl_sdr_tpu.models.ais import AisDecoder
    from tsl_sdr_tpu.testing import ais_gen

    pkts = [ais_gen.make_position_report(366123450 + k) for k in range(5)]
    bb = ais_gen.generate(pkts, amplitude=6000)
    decim = 16
    fs = 48000 * decim
    offset = 120_000
    pad = np.zeros(9_600, np.int16)
    iq = _fm_mod(np.concatenate([pad, bb, pad]), 48000, offset, fs,
                 amp=8000, dev_hz=9600, cfo_hz=250.0, sro_ppm=25.0)
    pcm = _receive(iq, fs, decim, offset, 12_500, 9_000,
                   noise_rms=300.0, seed=303)
    msgs = AisDecoder().on_pcm(pcm)
    assert len(msgs) >= 3, len(msgs)
    (OUT / "synthetic_ais_48khz.bin").write_bytes(pcm.tobytes())
    print(f"ais 48khz: {len(pcm)} samples, {len(msgs)} msgs decoded")


if __name__ == "__main__":
    OUT.mkdir(parents=True, exist_ok=True)
    make_pocsag_512bps()
    make_mm_anchor()
    make_ais_48khz()
    total = sum(f.stat().st_size for f in OUT.iterdir())
    print(f"total fixture bytes: {total}")
