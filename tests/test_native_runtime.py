"""Native C++ streaming runtime: build, format widening, FIFO flow, drops."""

import os
import shutil
import threading

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None, reason="no C++ toolchain"
)


def test_cs16_file_roundtrip(tmp_path):
    from tsl_sdr_tpu.runtime.native import NativeSource

    rng = np.random.default_rng(0)
    data = rng.integers(-30000, 30000, size=100_000, dtype=np.int64).astype(
        np.int16
    )
    p = tmp_path / "x.cs16"
    data.tofile(p)
    with NativeSource(p, "cs16", frame_samples=4096) as src:
        got = []
        while True:
            blk = src.read(7000)
            if blk.size == 0:
                break
            got.append(blk)
        got = np.concatenate(got)
        stats = src.stats
    np.testing.assert_array_equal(got, data)
    assert stats["values_in"] == data.size and stats["eof"]


def test_8bit_widening_matches_reference_semantics(tmp_path):
    from tsl_sdr_tpu.runtime.native import NativeSource
    from tsl_sdr_tpu.utils import iq as iqio

    raw = np.arange(256, dtype=np.uint8)
    p = tmp_path / "x.bin"
    raw.tofile(p)

    for fmt, ref in (
        ("cs8", iqio.read_iq_file(p, "cs8").reshape(-1)),
        ("cu8", iqio.read_iq_file(p, "cu8").reshape(-1)),
        ("rtl_u8", iqio.rtl_u8_to_q14(raw)),
    ):
        with NativeSource(p, fmt, frame_samples=64) as src:
            got = src.read(1000)
        np.testing.assert_array_equal(got, np.asarray(ref, np.int16)[: len(got)])


def test_fifo_source_and_sink(tmp_path):
    from tsl_sdr_tpu.runtime.native import NativeSink, NativeSource

    fifo_in = tmp_path / "in.fifo"
    fifo_out = tmp_path / "out.fifo"
    os.mkfifo(fifo_in)
    os.mkfifo(fifo_out)

    rng = np.random.default_rng(1)
    data = rng.integers(-30000, 30000, size=50_000, dtype=np.int64).astype(
        np.int16
    )
    results = {}

    def writer():
        with open(fifo_in, "wb") as f:
            f.write(data.tobytes())  # tofile() needs a seekable file

    def reader():
        with open(fifo_out, "rb") as f:
            results["echo"] = np.frombuffer(f.read(), dtype=np.int16)

    tw = threading.Thread(target=writer)
    tr = threading.Thread(target=reader)
    tw.start()
    tr.start()

    with NativeSource(fifo_in, "cs16", frame_samples=2048) as src:
        with NativeSink(fifo_out) as sink:
            while True:
                blk = src.read(3000)
                if blk.size == 0:
                    break
                sink.write(blk)
            stats = sink.stats
    tw.join()
    tr.join()
    np.testing.assert_array_equal(results["echo"], data)
    assert stats["values_out"] == data.size
    assert not stats["broken"]


def test_sink_epipe_drops_instead_of_failing(tmp_path):
    from tsl_sdr_tpu.runtime.native import NativeSink

    fifo = tmp_path / "p.fifo"
    os.mkfifo(fifo)
    fd = os.open(fifo, os.O_RDONLY | os.O_NONBLOCK)
    sink = NativeSink(fifo)
    os.close(fd)  # reader goes away -> writes hit EPIPE
    pcm = np.zeros(65536, np.int16)
    for _ in range(8):  # keep writing; must not raise
        sink.write(pcm)
    assert sink.stats["broken"] or sink.stats["dropped_writes"] >= 0
    sink.close()


def test_native_costas_matches_oracle_and_is_fast():
    import time

    from tsl_sdr_tpu.ops import costas
    from tsl_sdr_tpu.runtime.native import costas_native

    rng = np.random.default_rng(90)
    n = 60_000
    # locked-tone scenario: carrier with small offset + noise
    t = np.arange(n)
    ph = 2 * np.pi * 0.001 * t
    iq = (np.stack([np.cos(ph), np.sin(ph)], -1) * 9000
          + rng.normal(scale=80, size=(n, 2))).astype(np.int16)
    params = costas.make_costas_params(0.0, alpha=0.05, beta=0.002,
                                       e_max_q14=8192)
    want, _ = costas.costas_np(params, iq)
    got, _ = costas_native(iq, params)
    diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
    # the PLL is contractive; libm ulp differences stay within a few LSB
    assert np.median(diff) <= 1
    assert (diff <= 4).mean() > 0.99, (diff.max(), (diff > 4).mean())

    # load-robust speed check: native vs the numpy oracle measured on the
    # same box under the same load (~600x unloaded; require 20x)
    t0 = time.perf_counter()
    costas.costas_np(params, iq[:6_000])
    oracle_rate = 6_000 / (time.perf_counter() - t0)
    big = np.tile(iq, (40, 1))
    t0 = time.perf_counter()
    costas_native(big, params)
    native_rate = len(big) / (time.perf_counter() - t0)
    assert native_rate > 20 * oracle_rate, (native_rate, oracle_rate)


def test_async_feeder_orders_and_propagates():
    import numpy as np

    from tsl_sdr_tpu.runtime.feeder import AsyncFeeder

    blocks = [np.full((64,), i, np.int16) for i in range(10)]
    got = [int(np.asarray(b)[0]) for b in AsyncFeeder(iter(blocks), depth=2)]
    assert got == list(range(10))

    def bad():
        yield blocks[0]
        raise RuntimeError("producer broke")

    feeder = AsyncFeeder(bad(), depth=2)
    it = iter(feeder)
    next(it)
    import pytest

    with pytest.raises(RuntimeError, match="producer broke"):
        next(it)


def test_async_feeder_host_staging():
    """device_put=False stages plain numpy blocks (packed exact tier)."""
    import numpy as np

    from tsl_sdr_tpu.runtime.feeder import AsyncFeeder

    blocks = [np.full(16, k, np.int16) for k in range(5)]
    feeder = AsyncFeeder(iter(blocks), depth=2, device_put=False)
    got = list(feeder)
    assert all(isinstance(b, np.ndarray) for b in got)
    assert [int(b[0]) for b in got] == [0, 1, 2, 3, 4]
