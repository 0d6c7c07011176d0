"""Worker process for the executed multi-process self-test.

Run via ``python -m tsl_sdr_tpu.parallel._mh_worker`` by
:func:`tsl_sdr_tpu.parallel.multihost.run_multiprocess_selftest`. Each
worker is a real, separate OS process: it initializes ``jax.distributed``
on the CPU backend (gloo collectives), builds the global (time, channels)
mesh with :func:`multihost.make_global_mesh`, contributes its own
contiguous IQ span with :func:`multihost.distribute_iq`, runs the sharded
channelizer, and allgathers the global PCM so the launcher can check all
processes agree (and diff against a single-process run).

This is the executed form of the DCN story in SURVEY §2.2 (the reference
is single-host by design; scale-out is a new obligation here).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--nproc", type=int, required=True)
    ap.add_argument("--n-local", type=int, required=True)
    ap.add_argument("--channels-per-host", type=int, default=2)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--outdir", required=True)
    args = ap.parse_args()

    # must precede the first jax import in this process
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={args.n_local}"
    )

    import numpy as np
    import jax

    jax.config.update("jax_platforms", "cpu")

    from tsl_sdr_tpu.parallel import multihost

    # initialize BEFORE importing any module that touches a jax backend
    # (models/ops imports build jnp constants at import time)
    multihost.init(
        f"localhost:{args.port}",
        num_processes=args.nproc,
        process_id=args.pid,
    )
    from tsl_sdr_tpu.parallel.channelizer import make_sharded_multifm
    assert jax.process_count() == args.nproc, jax.process_count()
    assert jax.local_device_count() == args.n_local, jax.local_device_count()

    chain = multihost.selftest_chain(nr_channels=2 * args.channels_per_host)
    plan = chain.packed_plan
    mesh = multihost.make_global_mesh(args.channels_per_host)
    n_time = mesh.devices.shape[0]

    vals_full = multihost.selftest_capture(plan, n_time)
    span = vals_full.size // args.nproc
    local_vals = vals_full[args.pid * span : (args.pid + 1) * span]

    garr = multihost.distribute_iq(mesh, local_vals)
    fn = make_sharded_multifm(plan, mesh)
    out = fn(garr)

    from jax.experimental import multihost_utils

    pcm = np.asarray(multihost_utils.process_allgather(out, tiled=True))
    halo = multihost.dcn_halo_bytes(plan, args.nproc, args.channels_per_host)
    np.savez(
        os.path.join(args.outdir, f"mh_out_{args.pid}.npz"),
        pcm=pcm,
        halo_bytes=halo,
    )
    print(
        json.dumps(
            {
                "pid": args.pid,
                "procs": jax.process_count(),
                "global_devices": len(jax.devices()),
                "mesh": list(mesh.devices.shape),
                "pcm_shape": list(pcm.shape),
                "dcn_halo_bytes_per_block": halo,
            }
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
