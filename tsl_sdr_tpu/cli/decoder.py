"""decoder-tpu: FLEX / POCSAG / AIS decoder (reference ``decoder/decoder.c``).

Same flags as the reference: ``-m {flex,pocsag,ais} -I interp -D decim
-S in_rate -F filter.json -f freq_hz [-b] [-p pole] [-i] [-d pcm_dump]
[-o out.json] [-c] input``; reads int16 PCM from a file or FIFO,
polyphase-resamples to the protocol rate, optionally DC-blocks, runs the
protocol state machine and emits one JSON object per message.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np



def build_argparser():
    from tsl_sdr_tpu.cli import cli_version

    p = argparse.ArgumentParser(prog="decoder-tpu", description=__doc__)
    p.add_argument("-m", dest="mode", required=True,
                   choices=["flex", "pocsag", "ais"], type=str.lower)
    p.add_argument("-I", dest="interpolate", type=int, default=1)
    p.add_argument("-D", dest="decimate", type=int, default=1)
    p.add_argument("-S", dest="sample_rate", type=int, default=0)
    p.add_argument("-F", dest="filter_file", required=True)
    p.add_argument("-f", dest="freq", type=int, default=0,
                   help="channel center frequency (labeling only)")
    p.add_argument("-b", dest="dc_block", action="store_true")
    p.add_argument("-p", dest="dc_pole", type=float, default=0.9999)
    p.add_argument("-i", dest="invert", action="store_true")
    p.add_argument("-d", dest="pcm_dump", default=None)
    p.add_argument("-o", dest="out_file", default=None)
    p.add_argument("-c", dest="create_out", action="store_true")
    p.add_argument("--nmea", default=None, metavar="FILE",
                   help="AIS only: also emit standard NMEA 0183 !AIVDM "
                        "sentences (6-bit armor, fill bits, checksum, "
                        "multi-sentence split) to FILE ('-' = stdout) — "
                        "the interop format AIS tools consume")
    p.add_argument("--nmea-channel", default="A", choices=["A", "B"],
                   help="VHF channel letter stamped into --nmea sentences")
    p.add_argument("--exact", action="store_true", default=True)
    p.add_argument("--fast", dest="exact", action="store_false",
                   help="float fast tier for the resampler front-end")
    p.add_argument("input", help="input PCM file or FIFO")
    p.add_argument("-V", "--version", action="version",
                   version=f"%(prog)s {cli_version()}")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)

    from tsl_sdr_tpu.runtime.stream import install_sigterm_as_interrupt

    install_sigterm_as_interrupt()

    from tsl_sdr_tpu.models.resampler import ResamplerChain
    from tsl_sdr_tpu.runtime.stream import (
        PushResampler,
        StreamCounters,
        iter_file_blocks,
    )
    from tsl_sdr_tpu.utils import jsonout
    from tsl_sdr_tpu.utils.config import load_lpf_coeffs

    if args.mode == "flex":
        from tsl_sdr_tpu.models.flex import FlexDecoder

        proto = FlexDecoder(freq_hz=args.freq)
        to_json = jsonout.flex_message_json
    elif args.mode == "pocsag":
        from tsl_sdr_tpu.models.pocsag import PocsagDecoder

        proto = PocsagDecoder()
        to_json = jsonout.pocsag_message_json
    else:
        from tsl_sdr_tpu.models.ais import AisDecoder

        proto = AisDecoder()
        to_json = jsonout.ais_message_json
    if args.nmea is not None and args.mode != "ais":
        print("decoder-tpu: --nmea applies to -m ais only", file=sys.stderr)
        return 2
    nmea_out = None

    from tsl_sdr_tpu.utils.config import ConfigError

    try:
        coeffs = load_lpf_coeffs(args.filter_file)
    except ConfigError as e:
        print(f"decoder-tpu: {e}", file=sys.stderr)
        return 2
    chain = ResamplerChain(
        coeffs,
        args.interpolate,
        args.decimate,
        dc_block_pole=args.dc_pole if args.dc_block else None,
        exact=args.exact,
    )
    resampler = PushResampler(chain)

    if args.nmea is not None:
        # opened only after the config validated — a bad config must not
        # truncate an existing NMEA feed file
        from tsl_sdr_tpu.models.ais import NmeaEmitter

        nmea_out = (sys.stdout if args.nmea == "-"
                    else open(args.nmea, "w"))
        proto.packet_hook = NmeaEmitter(nmea_out,
                                        channel=args.nmea_channel)

    out = sys.stdout if args.out_file is None else open(
        args.out_file, "w" if args.create_out else "a"
    )
    dump = open(args.pcm_dump, "wb") if args.pcm_dump else None
    counters = StreamCounters()

    try:
        def handle(pcm):
            if pcm.size == 0:
                return
            pcm = np.asarray(pcm, dtype=np.int16)
            counters.samples_out += pcm.size
            if dump is not None:
                pcm.tofile(dump)
            # scan() = vectorized sync fast-forward, streaming-safe and
            # message-exact vs the plain FSM
            decode = getattr(proto, "scan", proto.on_pcm)
            for msg in decode(pcm):
                counters.messages += 1
                line = to_json(msg)
                if line:
                    out.write(line + "\n")
                    out.flush()

        for block in iter_file_blocks(args.input):
            counters.samples_in += len(block)
            if args.invert:
                block = (-block.astype(np.int32)).astype(np.int16)
            handle(resampler.push(block))
        handle(resampler.flush())
    except KeyboardInterrupt:
        pass
    finally:
        counters.crc_rejects = getattr(proto, "crc_rejects", 0)
        print(f"decoder-tpu: {counters.summary()}", file=sys.stderr)
        if out is not sys.stdout:
            out.close()
        if nmea_out is not None and nmea_out is not sys.stdout:
            nmea_out.close()
        if dump is not None:
            dump.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
