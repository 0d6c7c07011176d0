"""Hardware-source logic: gain planning, config parsing, test mode, taps."""

import json

import numpy as np
import pytest

from tsl_sdr_tpu.sources import (
    AirspyConfig,
    RtlSdrConfig,
    UhdConfig,
    e4000_if_gain_plan,
    select_tuner_gain,
)
from tsl_sdr_tpu.sources import test_mode_pattern as counter_pattern

# the R820T's published gain table, tenths of a dB (what librtlsdr reports)
R820T_GAINS = [0, 9, 14, 27, 37, 77, 87, 125, 144, 157, 166, 197, 207, 229,
               254, 280, 297, 328, 338, 364, 372, 386, 402, 421, 434, 439,
               445, 480, 496]


def test_select_tuner_gain_first_at_or_above():
    # reference walks until the running pick is >= the request
    # (rtl_sdr_if.c:263-271)
    assert select_tuner_gain(207, R820T_GAINS) == 207
    assert select_tuner_gain(200, R820T_GAINS) == 207
    assert select_tuner_gain(-5, R820T_GAINS) == 0
    assert select_tuner_gain(1000, R820T_GAINS) == 496


def test_e4000_ladder_converges_and_respects_stage_limits():
    maxes = [60, 90, 90, 20, 150, 150]
    for want in (0, 30, 100, 207, 300, 480, 10_000):
        stages, total = e4000_if_gain_plan(want)
        assert len(stages) == 6
        for g, m in zip(stages, maxes):
            assert g <= m
        assert total == 30 + sum(stages) - (-30 + 0 + 0 + 0 + 30 + 30)


def test_e4000_ladder_matches_reference_trace():
    # hand-run of the C loop (rtl_sdr_if.c:197-210) for a 20.7 dB request
    stages, total = e4000_if_gain_plan(207)
    assert total <= 207 + max(90, 30, 30, 10, 30, 30)
    assert abs(total - 207) <= 90  # within the coarsest step


def test_rtl_config_parsing():
    dev = {"deviceIndex": 1, "dBGainLNA": 20.7, "ppmCorrection": 43,
           "iqDumpFile": "/tmp/x.bin"}
    cfg = RtlSdrConfig.from_dict(dev, {"sdrTestMode": True})
    assert cfg.device_index == 1
    assert cfg.gain_tenths == 207
    assert cfg.ppm_correction == 43
    assert cfg.test_mode
    with pytest.raises(RuntimeError, match="rtlsdr"):
        cfg.open()


def test_airspy_config_validates_gain_ranges():
    AirspyConfig.from_dict({"lnaGain": 13, "vgaGain": 8, "mixerGain": 8})
    with pytest.raises(ValueError):
        AirspyConfig.from_dict({"lnaGain": 15})
    with pytest.raises(RuntimeError, match="airspy"):
        AirspyConfig.from_dict({}).open()


def test_uhd_config_gain_elements():
    cfg = UhdConfig.from_dict({
        "deviceId": "type=b200", "antenna": "RX2",
        "gain": [{"name": "PGA", "dBValue": 30.0}],
    })
    assert cfg.gains[0].name == "PGA" and cfg.gains[0].db_value == 30.0
    with pytest.raises(RuntimeError, match="usrp"):
        cfg.open()


def test_test_mode_pattern_wraps():
    p = counter_pattern(300, start=250)
    assert p[0] == 250 and p[5] == 255 and p[6] == 0
    assert p.dtype == np.uint8


def test_multifm_test_mode_and_debug_taps(tmp_path):
    """sdrTestMode synthesizes the counter stream; iq-dump and
    signalDebugFile taps write their files."""
    from tsl_sdr_tpu.cli import multifm as multifm_cli
    from tsl_sdr_tpu.utils.filter_design import firdes_low_pass

    fs, decim = 256_000, 16
    lpf = firdes_low_pass(1.0, fs, 9_600, 7_000)
    out_pcm = tmp_path / "ch0.pcm"
    dbg = tmp_path / "ch0.iq"
    cfg = {
        "device": {"type": "rtlsdr", "deviceIndex": 0, "dBGainLNA": 20.7},
        "sdrTestMode": True,
        "sampleRateHz": fs,
        "centerFreqHz": 929_500_000,
        "decimationFactor": decim,
        "lpfTaps": list(map(float, lpf)),
        "channels": [
            {"outFifo": str(out_pcm), "chanCenterFreq": 929_550_000,
             "signalDebugFile": str(dbg)},
        ],
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    iq_dump = tmp_path / "raw.iq"

    rc = multifm_cli.main([
        str(cfg_path), "--runtime", "python", "--block-size", "65536",
        "--iq-dump", str(iq_dump), "--test-samples", "262144",
    ])
    assert rc == 0
    assert out_pcm.stat().st_size > 0
    assert dbg.stat().st_size > 0
    raw = np.fromfile(iq_dump, dtype=np.int16)
    # the dump is the widened test-mode counter: (u8 - 127) << 7
    from tsl_sdr_tpu.sources.rtl_sdr import test_mode_pattern as tp
    from tsl_sdr_tpu.utils.iq import rtl_u8_to_q14

    want = rtl_u8_to_q14(tp(raw.size))
    np.testing.assert_array_equal(raw, want[: raw.size])
    # debug IQ has 2 int16 per output sample, same count as PCM
    assert dbg.stat().st_size == 2 * out_pcm.stat().st_size


def test_hexdump_and_message(caplog):
    from tsl_sdr_tpu.utils.diag import hexdump, message

    out = hexdump(b"Hello\x00World!" + bytes(range(8)))
    assert out.splitlines()[0].startswith("00000000")
    assert "|Hello.World!" in out
    import logging
    with caplog.at_level(logging.INFO):
        message("MFM", "INFO", "RECV-GAIN", "gain set to %d.%d dB", 20, 7)
    assert "RECV-GAIN" in caplog.text and "20.7" in caplog.text
