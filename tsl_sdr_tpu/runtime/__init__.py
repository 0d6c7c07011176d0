"""Host streaming runtime: push-style adapters, IO loops, counters.

This is the framework equivalent of the reference's receiver/demod-thread
machinery (``multifm/receiver.c``, ``multifm/demod.c``) and the stream
tools' blocking read loops — redesigned around block processing: the host
feeds fixed-size blocks to jitted device steps and drains results, with
JAX's async dispatch providing the compute/IO overlap the reference got
from worker threads.
"""

from tsl_sdr_tpu.runtime.stream import PushResampler, StreamCounters  # noqa: F401
