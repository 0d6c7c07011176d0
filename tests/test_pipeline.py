"""End-to-end ReceivePipeline: two protocol channels in one wideband capture.

Mirrors the reference's deployment shape (multifm + per-channel
resampler/decoder over FIFOs, SURVEY §3.4) as one in-process call.
"""

import numpy as np

from tsl_sdr_tpu.models.pipeline import ChannelSpec, ReceivePipeline
from tsl_sdr_tpu.testing import flex_gen, pocsag_gen
from tsl_sdr_tpu.utils.filter_design import firdes_low_pass


def _fm_mod(baseband, channel_rate, offset, fs, amp=9000, dev_hz=None):
    """NBFM-modulate decoder-rate PCM onto a carrier at ``offset`` in a
    wideband capture; zero-order-hold upsampling handles non-integer
    fs/channel_rate ratios."""
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


def test_two_protocol_channels_one_capture():
    decim = 32
    fs = 38400 * decim  # 1.2288 Msps; channel rate 38400
    center = 929_500_000

    pocsag_off = 250_000
    flex_off = -180_000
    ais_off = 400_000

    bursts = [pocsag_gen.PocsagBurst(capcode=1122334, function=2,
                                     kind="alpha", content="PIPE POCSAG")]
    p_bb = pocsag_gen.generate(bursts, baud=1200, amplitude=4096,
                               tail_bits=256)
    p_iq = _fm_mod(p_bb, 38400, pocsag_off, fs)

    f_msgs = [flex_gen.FlexBurstMessage(capcode=1234567, kind="alnum",
                                        content="PIPE FLEX")]
    f_bb, f_expected = flex_gen.generate(f_msgs, baud=1600, fsk_levels=2,
                                         amplitude=6144, tail_bits=300)
    f_iq = _fm_mod(f_bb, 16000, flex_off, fs, amp=7000)

    from tsl_sdr_tpu.testing import ais_gen

    a_bb = ais_gen.generate(
        [ais_gen.make_position_report(367999111, longitude=-70.9,
                                      latitude=42.36)],
        amplitude=9000,
    )
    a_iq = _fm_mod(a_bb, 48000, ais_off, fs, amp=7000, dev_hz=4800)

    n = max(len(p_iq), len(f_iq), len(a_iq))
    iq = np.zeros((n, 2))
    iq[: len(p_iq)] += p_iq
    iq[: len(f_iq)] += f_iq
    iq[: len(a_iq)] += a_iq
    rng = np.random.default_rng(21)
    iq = (iq + rng.normal(scale=120, size=iq.shape)).astype(np.int16)

    lpf = firdes_low_pass(1.0, fs, 12_000, 8_000)
    pipe = ReceivePipeline(
        lpf, center, fs, decim,
        [
            ChannelSpec(center + pocsag_off, "pocsag"),
            ChannelSpec(center + flex_off, "flex"),
            ChannelSpec(center + ais_off, "ais"),
        ],
        exact=False,
    )
    pocsag_msgs, flex_msgs, ais_msgs = pipe.process_capture(iq)

    assert [(m.capcode, m.data) for m in pocsag_msgs] == [
        (1122334, b"PIPE POCSAG")
    ]
    assert len(flex_msgs) == 1
    assert flex_msgs[0].capcode == 1234567
    assert flex_msgs[0].text == "PIPE FLEX"
    assert [m.mmsi for m in ais_msgs] == [367999111]


def test_pipeline_cli(tmp_path):
    """pipeline-tpu: capture with a POCSAG channel + a pcm channel."""
    import json as jsonlib

    from tsl_sdr_tpu.cli import pipeline as pipeline_cli

    decim = 32
    fs = 38400 * decim
    center = 929_500_000
    off = 250_000
    bursts = [pocsag_gen.PocsagBurst(capcode=555001, function=1,
                                     kind="alpha", content="CLI PIPE")]
    p_bb = pocsag_gen.generate(bursts, baud=1200, amplitude=4096,
                               tail_bits=256)
    iq = _fm_mod(p_bb, 38400, off, fs)
    rng = np.random.default_rng(5)
    iq = (iq + rng.normal(scale=100, size=iq.shape)).astype(np.int16)
    iq_path = tmp_path / "cap.cs16"
    iq.reshape(-1).tofile(iq_path)

    lpf = firdes_low_pass(1.0, fs, 9_600, 7_000)
    audio_out = tmp_path / "audio.pcm"
    cfg = {
        "device": {"type": "file", "filename": str(iq_path),
                   "fileFormat": "cs16"},
        "sampleRateHz": fs,
        "centerFreqHz": center,
        "decimationFactor": decim,
        "lpfTaps": list(map(float, lpf)),
        "channels": [
            {"chanCenterFreq": center + off, "protocol": "pocsag",
             "outFifo": ""},
            {"chanCenterFreq": center - 200_000, "outFifo": str(audio_out)},
        ],
    }
    cfg_path = tmp_path / "p.json"
    cfg_path.write_text(jsonlib.dumps(cfg))
    out = tmp_path / "msgs.json"
    rc = pipeline_cli.main([str(cfg_path), "-o", str(out)])
    assert rc == 0
    lines = [jsonlib.loads(x) for x in out.read_text().splitlines()]
    assert len(lines) == 1
    m = lines[0]
    assert m["proto"] == "pocsag" and m["capCode"] == 555001
    assert m["message"] == "CLI PIPE"
    assert m["freqHz"] == center + off
    assert audio_out.stat().st_size > 0


def test_device_decode_equals_host_path():
    """device_decode (device-side resample + sign bit-pack, VERDICT r1 #3)
    produces the same messages as the host path."""
    decim = 32
    fs = 38400 * decim
    center = 929_500_000
    off = 250_000
    bursts = [pocsag_gen.PocsagBurst(capcode=31415, function=0, kind="alpha",
                                     content="PACKED BITS")]
    p_bb = pocsag_gen.generate(bursts, baud=1200, amplitude=4096,
                               tail_bits=256)
    iq = _fm_mod(p_bb, 38400, off, fs)
    rng = np.random.default_rng(9)
    iq = (iq + rng.normal(scale=120, size=iq.shape)).astype(np.int16)

    lpf = firdes_low_pass(1.0, fs, 12_000, 8_000)

    def run(device_decode):
        pipe = ReceivePipeline(
            lpf, center, fs, decim,
            [ChannelSpec(center + off, "pocsag")], exact=False)
        (msgs,) = pipe.process_capture(iq, device_decode=device_decode)
        return [(m.capcode, m.kind, m.data) for m in msgs]

    on = run(True)
    offp = run(False)
    assert on == offp == [(31415, "alpha", b"PACKED BITS")]
