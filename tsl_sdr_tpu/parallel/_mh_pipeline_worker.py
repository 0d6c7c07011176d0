"""Worker process for the executed multi-process PIPELINE self-test.

Run via ``python -m tsl_sdr_tpu.parallel._mh_pipeline_worker`` (see
``tests/test_multihost.py``). Each worker is a real, separate OS process:
it initializes ``jax.distributed`` on the CPU backend (gloo collectives),
builds a global time mesh spanning every process, constructs the FULL
fused :class:`~tsl_sdr_tpu.models.pipeline.ReceivePipeline` with that
mesh — channelize, resample, DC block, sign-slice, bit-pack and the sync
prefilters GSPMD-partitioned across the process boundary, the per-block
outputs gathered back over DCN — and decodes a deterministic POCSAG
capture. The launcher asserts every process decodes the identical
messages, equal to a single-process (no-mesh) run of the same capture.

This extends the executed DCN story (SURVEY §2.2 row 5; the channelizer
form lives in ``_mh_worker.py``) to the end-to-end deployment path.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _capture(fs: int, decim: int):
    """Deterministic two-burst POCSAG capture (NBFM at +250 kHz)."""
    import numpy as np

    from tsl_sdr_tpu.testing import pocsag_gen

    def burst(cap, txt):
        bb = pocsag_gen.generate(
            [pocsag_gen.PocsagBurst(capcode=cap, function=1, kind="alpha",
                                    content=txt)],
            baud=1200, amplitude=4096, tail_bits=256)
        dev = bb.astype(np.float64) / 16384.0 * 4500
        rep = fs // 38400
        inst = np.repeat(250_000 + dev, rep)
        ph = np.cumsum(2 * np.pi * inst / fs)
        return (np.stack([np.cos(ph), np.sin(ph)], -1) * 8000).astype(
            np.int16)

    rng = np.random.default_rng(9)
    pad = rng.integers(-300, 300, size=(500_000, 2)).astype(np.int16)
    iq = np.concatenate([pad, burst(7001, "MH PIPE ONE"), pad,
                         burst(7002, "MH PIPE TWO"), pad])
    return (iq + rng.normal(scale=90, size=iq.shape)).astype(np.int16)


def run_pipeline(mesh):
    """Build + run the deterministic pipeline; returns message tuples."""
    import numpy as np  # noqa: F401  (kept for parity with _capture)

    from tsl_sdr_tpu.models.pipeline import ChannelSpec, ReceivePipeline
    from tsl_sdr_tpu.utils.filter_design import firdes_low_pass

    decim, fs, center = 32, 38400 * 32, 929_500_000
    lpf = firdes_low_pass(1.0, fs, 9_600, 7_000)
    pipe = ReceivePipeline(
        lpf, center, fs, decim,
        [ChannelSpec(center + 250_000, "pocsag"),
         ChannelSpec(center - 250_000, "pocsag")],  # silent: gated
        exact=False, block_size=393_216, mesh=mesh,
    )
    res = pipe.process_capture(_capture(fs, decim))
    msgs = [[(m.capcode, bytes(m.data).decode("latin-1")) for m in ch]
            for ch in res]
    return msgs, pipe.stream_stats


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--nproc", type=int, required=True)
    ap.add_argument("--n-local", type=int, required=True)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--outdir", required=True)
    ap.add_argument("--channels", type=int, default=1,
                    help="mesh channel-axis size (time axis gets the rest)")
    args = ap.parse_args()

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={args.n_local}"
    )

    import jax

    jax.config.update("jax_platforms", "cpu")

    from tsl_sdr_tpu.parallel import multihost

    multihost.init(
        f"localhost:{args.port}",
        num_processes=args.nproc,
        process_id=args.pid,
    )
    assert jax.process_count() == args.nproc, jax.process_count()

    from tsl_sdr_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(time=len(jax.devices()) // args.channels,
                     channels=args.channels)
    msgs, stats = run_pipeline(mesh)

    with open(os.path.join(args.outdir, f"mhp_out_{args.pid}.json"),
              "w") as f:
        json.dump({"msgs": msgs, "blocks": int(stats["blocks"]),
                   "fetched": [int(v) for v in stats["fetched"]],
                   "upload_elems": int(stats["upload_elems"])}, f)
    print(json.dumps({"pid": args.pid, "procs": jax.process_count(),
                      "global_devices": len(jax.devices()),
                      "msgs": msgs}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
