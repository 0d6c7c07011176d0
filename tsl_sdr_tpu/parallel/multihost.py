"""Multi-host deployment helpers: ICI within a slice, DCN between hosts.

The reference is a single-host program (SURVEY §2.2); scale-out here is a
new design obligation. The recipe:

* each host calls :func:`init` (jax.distributed) so every process sees the
  global device set;
* :func:`make_global_mesh` lays the (time, channels) axes out so the
  CHANNEL axis stays *within* each host's slice — the channel bank needs no
  inter-shard traffic at all, and the time axis's two small halo
  ``ppermute``s (window spill + FM look-back, see
  :mod:`tsl_sdr_tpu.parallel.channelizer`) ride ICI between neighboring
  devices; only time-shard boundaries that cross hosts touch DCN, and those
  move ``(cr_rows + 1) * ROW`` int16 values per block — a few KB;
* each host feeds its own time-contiguous IQ span via
  ``jax.make_array_from_process_local_data``.

Untestable on a single-host CI; the per-process sharded kernel itself is
exercised on a virtual 8-device mesh (tests/test_parallel.py) and via
``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tsl_sdr_tpu.parallel.mesh import CHANNEL_AXIS, TIME_AXIS


def init(coordinator_address: str | None = None, num_processes: int | None = None,
         process_id: int | None = None):
    """Initialize jax.distributed (no-op when already initialized or
    single-process)."""
    if jax.process_count() > 1:
        return
    if coordinator_address is None:
        return  # single host
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def layout_devices(devs, n_local: int, channels_per_host: int):
    """Pure device-layout math behind :func:`make_global_mesh`.

    ``devs``: all devices in jax's global (process-major) order. Returns a
    [time, channels] array where every channel row lives on one host (no
    DCN inside the channel bank) and the time axis walks hosts in process
    order, so each host's IQ span is contiguous in stream time.
    """
    devs = np.asarray(devs, dtype=object)
    if n_local % channels_per_host:
        raise ValueError(
            f"{n_local} local devices not divisible by {channels_per_host}"
        )
    if devs.size % n_local:
        raise ValueError(
            f"{devs.size} devices not divisible by {n_local} per host"
        )
    time_per_host = n_local // channels_per_host
    n_proc = devs.size // n_local
    return devs.reshape(n_proc * time_per_host, channels_per_host)


def make_global_mesh(channels_per_host: int = 1) -> Mesh:
    """(time, channels) mesh over ALL processes' devices.

    Channel shards are constrained to a single host (no DCN inside the
    channel bank); the time axis spans hosts in process order so each
    host's IQ span is contiguous in stream time.
    """
    dev_array = layout_devices(
        jax.devices(), jax.local_device_count(), channels_per_host
    )
    return Mesh(dev_array, (TIME_AXIS, CHANNEL_AXIS))


def distribute_iq(mesh: Mesh, local_vals: np.ndarray):
    """Assemble the global time-sharded IQ array from per-host spans.

    ``local_vals``: this host's contiguous span of flat interleaved int16
    values (hosts in process order = stream order).
    """
    sharding = NamedSharding(mesh, P(TIME_AXIS))
    return jax.make_array_from_process_local_data(sharding, local_vals)
