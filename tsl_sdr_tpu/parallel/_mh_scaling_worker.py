"""Worker process for the executed multi-process WEAK-SCALING witness.

Run via ``python -m tsl_sdr_tpu.parallel._mh_scaling_worker`` by
``bench/scaling_model.py``. Each worker is a real OS process
(jax.distributed, CPU backend, gloo collectives over the loopback "DCN");
the group runs the time-sharded channelizer with a FIXED per-process IQ
span while the process count grows — weak scaling. Every process times a
rep loop of the jitted sharded step (state-free form; the halo ppermutes
execute inside) and reports its median step wall time plus the halo bytes
that crossed the process boundary.

This is the communication-structure WITNESS for SCALING.md: it executes
the exact collectives (per-boundary carry halo, 1/P per-host upload,
replicated gather) across real process boundaries. The efficiency
PREDICTION for TPU pods comes from measured single-chip block times +
the halo byte counts this witness pins down — a one-box CPU run cannot
measure ICI/DCN time (all "DCN" here is loopback, and the virtual CPU
devices contend for the same cores).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--nproc", type=int, required=True)
    ap.add_argument("--n-local", type=int, required=True)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--outdir", required=True)
    ap.add_argument("--rows-per-shard", type=int, default=512)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={args.n_local}"
    )

    import numpy as np
    import jax

    jax.config.update("jax_platforms", "cpu")

    from tsl_sdr_tpu.parallel import multihost

    multihost.init(
        f"localhost:{args.port}",
        num_processes=args.nproc,
        process_id=args.pid,
    )
    from tsl_sdr_tpu.parallel.channelizer import make_sharded_multifm

    chain = multihost.selftest_chain(nr_channels=2)
    plan = chain.packed_plan
    mesh = multihost.make_global_mesh(1)  # time-only sharding
    n_time = mesh.devices.shape[0]

    # weak scaling: FIXED samples per device; the global block grows with
    # the process count
    rng = np.random.default_rng(100 + args.pid)
    span = args.rows_per_shard * plan.row * args.n_local
    local_vals = rng.integers(-8000, 8000, size=span,
                              dtype=np.int64).astype(np.int16)

    garr = multihost.distribute_iq(mesh, local_vals)
    fn = make_sharded_multifm(plan, mesh)
    out = fn(garr)  # compile + first run
    out.block_until_ready()

    times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        out = fn(garr)
        out.block_until_ready()
        times.append(time.perf_counter() - t0)
    times.sort()
    med = times[len(times) // 2]

    halo = multihost.dcn_halo_bytes(plan, args.nproc, 1)
    rec = {
        "pid": args.pid,
        "procs": args.nproc,
        "n_time": int(n_time),
        "samples_per_host": int(span // 2),
        "global_block_samples": int(span // 2 * args.nproc),
        "step_ms_median": round(med * 1e3, 2),
        "dcn_halo_bytes_per_block": int(halo),
        "upload_elems_per_host": int(span),
    }
    with open(os.path.join(args.outdir, f"mhs_out_{args.pid}.json"),
              "w") as f:
        json.dump(rec, f)
    print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
