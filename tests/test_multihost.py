"""Executed multi-process (DCN-path) tests: real OS processes running
``jax.distributed`` on the CPU backend.

Covers what `tests/test_parallel.py::test_multihost_device_layout` could
not: ``multihost.init`` + ``make_global_mesh`` + ``distribute_iq`` actually
executing across process boundaries, with cross-process collectives (gloo)
carrying the halo exchange, and the global result matching a
single-process run of the identical capture bit-for-bit.

Reference context: the reference is single-host by design
(/root/reference/multifm/multifm.c); SURVEY §2.2 row 5 makes scale-out a
new obligation for this framework.
"""

import numpy as np
import pytest

from tsl_sdr_tpu.parallel import multihost
from tsl_sdr_tpu.parallel.mesh import make_mesh


def _expected_pcm(n_time: int, channels_per_host: int) -> np.ndarray:
    """Single-process run of the self-test capture on an identically-shaped
    mesh (same shard partitioning => bit-identical f32 math)."""
    from tsl_sdr_tpu.parallel.channelizer import make_sharded_multifm

    chain = multihost.selftest_chain(nr_channels=2 * channels_per_host)
    plan = chain.packed_plan
    mesh = make_mesh(time=n_time, channels=channels_per_host)
    fn = make_sharded_multifm(plan, mesh)
    vals = multihost.selftest_capture(plan, n_time)
    return np.asarray(fn(vals))


@pytest.mark.parametrize(
    "n_processes,n_local",
    [(2, 4), (4, 2)],
    ids=["2proc_x4dev", "4proc_x2dev"],
)
def test_multiprocess_channelizer_matches_single_process(n_processes, n_local):
    channels_per_host = 2
    res = multihost.run_multiprocess_selftest(
        n_processes, n_local, channels_per_host
    )
    n_time = n_processes * (n_local // channels_per_host)
    assert res["mesh_shape"] == (n_time, channels_per_host)

    expected = _expected_pcm(n_time, channels_per_host)
    assert res["pcm"].shape == expected.shape
    assert np.array_equal(res["pcm"], expected), (
        np.abs(res["pcm"].astype(np.int32) - expected.astype(np.int32)).max()
    )

    # the DCN halo really is a few KB per block, as multihost.py promises
    chain = multihost.selftest_chain(nr_channels=2 * channels_per_host)
    plan = chain.packed_plan
    assert res["dcn_halo_bytes"] == (
        (n_processes - 1) * (plan.cr_rows + 1) * plan.row * 2
        * channels_per_host  # one time-axis ppermute per channel column
    )
    # tiny test capture; production blocks are MBs so the ratio only shrinks
    block_bytes = multihost.selftest_capture(plan, n_time).nbytes
    assert res["dcn_halo_bytes"] < block_bytes / 20


@pytest.mark.parametrize("mesh_channels,upload_frac", [
    # time-only mesh: each process uploads ONLY its local time span
    # (1/P of every block), not a replicated copy
    (1, 0.5),
    # mixed time x channels mesh: the time span is additionally
    # replicated across the channel axis's local devices (2 shards x 2
    # channel copies = one block's worth per process; per-DEVICE upload
    # is still 1/4 block)
    (2, 1.0),
])
def test_multiprocess_fused_pipeline_decodes_identically(
        mesh_channels, upload_frac):
    """The FULL fused receive pipeline (channelize -> resample -> DC ->
    sign-slice -> bit-pack -> sync prefilters, one dispatch per block)
    executed across 2 REAL OS processes (jax.distributed, gloo): GSPMD
    partitions the program over the process boundary, the gated outputs
    gather back over DCN, and every process decodes exactly the messages
    a single-process (no-mesh) run produces — including identical
    egress-gating fetch counters. Block ingest is time-sharded from each
    process's local span (jax.make_array_from_single_device_arrays), so
    hosts upload a fraction of each block, not a replicated copy."""
    import json
    from pathlib import Path

    from tsl_sdr_tpu.parallel import multihost
    from tsl_sdr_tpu.parallel._mh_pipeline_worker import run_pipeline

    td, _logs = multihost.launch_workers(
        "tsl_sdr_tpu.parallel._mh_pipeline_worker", 2, 4, timeout=900.0,
        extra_args=("--channels", str(mesh_channels)))
    with td:
        outs = [
            json.load(open(Path(td.name) / f"mhp_out_{pid}.json"))
            for pid in range(2)
        ]

    want_msgs, want_stats = run_pipeline(None)  # single-process reference
    want = [[list(m) for m in ch] for ch in want_msgs]
    assert [m[0] for m in want[0]] == [7001, 7002], want
    assert not want[1]  # silent channel gated
    for o in outs:
        assert o["msgs"] == want, o
        assert o["fetched"] == [int(v) for v in want_stats["fetched"]], o
        assert o["blocks"] == int(want_stats["blocks"])
        assert o["upload_elems"] == int(
            want_stats["upload_elems"] * upload_frac), o
