"""Full deployment integration: multifm-tpu -> named FIFO -> decoder-tpu.

The reference's operational shape (SURVEY §3.4): one channelizer process
writes per-channel PCM into operator-created named FIFOs and decoder
processes read them. Here the two CLIs run concurrently in threads over a
real FIFO, exercising the native runtime's blocking-FIFO semantics and
backpressure end to end.
"""

import json
import os
import shutil
import threading

import numpy as np
import pytest

from tsl_sdr_tpu.cli import decoder as decoder_cli
from tsl_sdr_tpu.cli import multifm as multifm_cli
from tsl_sdr_tpu.testing import pocsag_gen
from tsl_sdr_tpu.utils.filter_design import firdes_low_pass

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None, reason="no C++ toolchain"
)

UNITY_FILTER = {"lpfCoeffs": [1.0]}


@pytest.mark.parametrize("tier_flags", [
    [],           # production fast tier
    ["--exact"],  # bit-exact tier through the pipelined begin/end loop
], ids=["fast", "exact"])
def test_multifm_fifo_decoder_deployment(tmp_path, tier_flags):
    decim = 32
    fs = 38400 * decim
    offset = 150_000
    bursts = [pocsag_gen.PocsagBurst(capcode=31337, function=2, kind="alpha",
                                     content="FIFO DEPLOY")]
    bb = pocsag_gen.generate(bursts, baud=1200, amplitude=4096, tail_bits=512)
    dev = bb.astype(np.float64) / 16384.0 * (38400 / 2)
    ph = np.cumsum(np.repeat(2 * np.pi * (offset + dev) / fs, decim))
    iq = (np.stack([np.cos(ph), np.sin(ph)], -1) * 9000).astype(np.int16)
    iq_path = tmp_path / "cap.cs16"
    iq.reshape(-1).tofile(iq_path)

    fifo = tmp_path / "ch0.fifo"
    os.mkfifo(fifo)

    lpf = firdes_low_pass(1.0, fs, 9_600, 7_000)
    cfg = {
        "device": {"type": "file", "filename": str(iq_path),
                   "fileFormat": "cs16"},
        "sampleRateHz": fs,
        "centerFreqHz": 929_500_000,
        "decimationFactor": decim,
        "lpfTaps": list(map(float, lpf)),
        "channels": [
            {"outFifo": str(fifo), "chanCenterFreq": 929_500_000 + offset},
        ],
    }
    cfg_path = tmp_path / "mfm.json"
    cfg_path.write_text(json.dumps(cfg))
    filt = tmp_path / "filt.json"
    filt.write_text(json.dumps(UNITY_FILTER))
    out_json = tmp_path / "msgs.json"

    results = {}

    def run_multifm():
        results["mfm"] = multifm_cli.main(
            [str(cfg_path), *tier_flags, "--runtime", "native",
             "--block-size", "131072"]
        )

    def run_decoder():
        results["dec"] = decoder_cli.main([
            "-m", "pocsag", "-I", "1", "-D", "1", "-S", "38400",
            "-F", str(filt), "-f", str(929_500_000 + offset),
            "-o", str(out_json), "-c", str(fifo),
        ])

    # decoder first: its open() blocks until the channelizer attaches the
    # writer end — the reference's startup ordering contract
    td = threading.Thread(target=run_decoder)
    tm = threading.Thread(target=run_multifm)
    td.start()
    tm.start()
    tm.join(timeout=180)
    td.join(timeout=60)
    assert results.get("mfm") == 0 and results.get("dec") == 0, results

    lines = [json.loads(x) for x in out_json.read_text().splitlines()]
    assert len(lines) == 1
    assert lines[0]["capCode"] == 31337
    assert lines[0]["message"].startswith("FIFO DEPLOY")
