"""Mesh construction helpers."""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


TIME_AXIS = "time"
CHANNEL_AXIS = "channels"


def make_mesh(
    time: int | None = None,
    channels: int = 1,
    devices=None,
) -> Mesh:
    """Build a (time, channels) mesh over the available devices.

    ``time=None`` uses all remaining devices on the time axis.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if time is None:
        if n % channels:
            raise ValueError(f"{n} devices not divisible by channels={channels}")
        time = n // channels
    if time * channels > n:
        raise ValueError(
            f"mesh {time}x{channels} needs {time * channels} devices, have {n}"
        )
    dev_array = np.asarray(devices[: time * channels]).reshape(time, channels)
    return Mesh(dev_array, (TIME_AXIS, CHANNEL_AXIS))
