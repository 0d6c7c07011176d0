"""pipeline-tpu: wideband IQ capture -> decoded messages, one process.

Replaces the reference's full deployment (multifm + per-channel resampler +
decoder processes glued by operator-created FIFOs, SURVEY §3.4) with a
single command. The config extends the multifm vocabulary: each channel may
carry ``"protocol": "pocsag" | "flex" | "ais" | "pcm"`` (default pcm, which
writes demodulated audio to ``outFifo`` like multifm would).

Example config additions::

    "channels": [
      {"chanCenterFreq": 929838000, "protocol": "flex"},
      {"chanCenterFreq": 929612500, "protocol": "pocsag", "dcBlock": true},
      {"chanCenterFreq": 930500000, "outFifo": "audio.pcm"}
    ]

Messages are emitted as JSON lines (the decoder CLI's format) to --output
or stdout, tagged with the channel's center frequency.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def build_argparser():
    p = argparse.ArgumentParser(prog="pipeline-tpu", description=__doc__)
    p.add_argument("configs", nargs="+", help="JSON config file(s), merged")
    p.add_argument("--iq-file", default=None)
    p.add_argument("--iq-format", default=None,
                   choices=["cs16", "cs8", "cu8", "rtl_u8"])
    p.add_argument("-o", "--output", default=None, help="messages JSON file")
    p.add_argument("--exact", action="store_true",
                   help="bit-exact integer front-end tier")
    p.add_argument("--backend", default="xla", choices=["xla", "pallas"])
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)

    from tsl_sdr_tpu.models.pipeline import ChannelSpec, ReceivePipeline
    from tsl_sdr_tpu.utils import iq as iqio
    from tsl_sdr_tpu.utils.config import MultifmConfig, load_config
    from tsl_sdr_tpu.utils.jsonout import message_to_json

    raw = load_config(*args.configs)
    cfg = MultifmConfig.from_dict(raw)

    iq_path = args.iq_file
    iq_fmt = args.iq_format
    if cfg.device.type == "file" and iq_path is None:
        iq_path = cfg.device.params["filename"]
        iq_fmt = iq_fmt or cfg.device.params.get("fileFormat", "cs16")
    if iq_path is None:
        print("pipeline-tpu: need a file device or --iq-file", file=sys.stderr)
        return 2

    specs = []
    for ch_raw, ch in zip(raw["channels"], cfg.channels):
        specs.append(
            ChannelSpec(
                center_freq_hz=ch.chan_center_freq,
                protocol=str(ch_raw.get("protocol", "pcm")).lower(),
                invert=bool(ch_raw.get("invert", False)),
                dc_block=bool(ch_raw.get("dcBlock", False)),
                dc_block_pole=float(ch_raw.get("dcBlockPole", 0.9999)),
                db_gain=ch_raw.get("dBGain"),
            )
        )

    pipe = ReceivePipeline(
        cfg.lpf_taps, cfg.center_freq_hz, cfg.sample_rate_hz,
        cfg.decimation_factor, specs,
        exact=args.exact, backend=args.backend,
    )

    iq = iqio.read_iq_file(iq_path, iq_fmt or "cs16")
    t0 = time.monotonic()
    results = pipe.process_capture(iq)
    dt = time.monotonic() - t0

    out = open(args.output, "w") if args.output else sys.stdout
    n_msgs = 0
    try:
        for spec, ch, res in zip(specs, cfg.channels, results):
            if spec.protocol == "pcm":
                if ch.out_fifo:
                    np.asarray(res, np.int16).tofile(ch.out_fifo)
                continue
            for m in res:
                out.write(
                    message_to_json(m, freq_hz=spec.center_freq_hz) + "\n"
                )
                n_msgs += 1
    finally:
        if out is not sys.stdout:
            out.close()
    print(
        f"pipeline-tpu: {len(iq)} samples, {len(specs)} channels, "
        f"{n_msgs} messages in {dt:.2f}s "
        f"({len(iq) / dt / 1e6:.1f} Msps)",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
