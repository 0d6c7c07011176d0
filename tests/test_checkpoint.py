"""Checkpoint/resume: mid-stream save + restore reproduces the exact stream."""

import numpy as np

from tsl_sdr_tpu.models.channelizer import MultifmChain
from tsl_sdr_tpu.utils.checkpoint import load_state, save_state
from tsl_sdr_tpu.utils.filter_design import firdes_low_pass


def test_checkpoint_resume_bitexact(tmp_path):
    fs, d = 128_000, 4
    lpf = firdes_low_pass(1.0, fs, 12_000, 8_000)[:41]
    chain = MultifmChain(lpf, [8_000, -24_000], fs, d, exact=False)
    q = chain.block_quantum
    rng = np.random.default_rng(30)
    x = rng.integers(-9000, 9000, size=(chain.carry_len + 40 * q, 2),
                     dtype=np.int64).astype(np.int16)

    # uninterrupted run
    st = chain.init_state(prefix=x[: chain.carry_len])
    pos = chain.carry_len
    ref = []
    for _ in range(4):
        st, pcm = chain.step(st, x[pos : pos + 10 * q])
        pos += 10 * q
        ref.append(np.asarray(pcm))
    ref = np.concatenate(ref, axis=1)

    # run half, checkpoint, restart from disk, run the rest
    st = chain.init_state(prefix=x[: chain.carry_len])
    pos = chain.carry_len
    out = []
    for _ in range(2):
        st, pcm = chain.step(st, x[pos : pos + 10 * q])
        pos += 10 * q
        out.append(np.asarray(pcm))
    ckpt = tmp_path / "stream.npz"
    save_state(ckpt, st, meta={"pos": pos})

    st2, meta = load_state(ckpt, chain.init_state())
    assert meta["pos"] == pos
    for _ in range(2):
        st2, pcm = chain.step(st2, x[pos : pos + 10 * q])
        pos += 10 * q
        out.append(np.asarray(pcm))
    out = np.concatenate(out, axis=1)
    np.testing.assert_array_equal(ref, out)


def test_checkpoint_shape_mismatch_rejected(tmp_path):
    import pytest

    fs, d = 128_000, 4
    lpf = firdes_low_pass(1.0, fs, 12_000, 8_000)[:41]
    chain = MultifmChain(lpf, [8_000], fs, d, exact=False)
    other = MultifmChain(lpf, [8_000, -24_000], fs, d, exact=False)
    p = tmp_path / "s.npz"
    save_state(p, chain.init_state())
    with pytest.raises(ValueError, match="checkpoint leaf"):
        load_state(p, other.init_state())


def test_throughput_meter():
    from tsl_sdr_tpu.utils.profiling import Throughput

    t = Throughput()
    t.update(1000)
    t.update(1000)
    assert t.total == 2000
    assert "samples" in t.summary()


def test_pipeline_stream_checkpoint_resume(tmp_path):
    """ReceivePipeline.checkpoint_stream/restore_stream: kill the process
    mid-stream (simulated by a fresh pipeline object), restore, continue —
    messages before and after the boundary match an uninterrupted run
    (utils/checkpoint.py's deployment story for the flagship path)."""
    import numpy as np
    import pytest

    from tsl_sdr_tpu.models.pipeline import ChannelSpec, ReceivePipeline
    from tsl_sdr_tpu.testing import pocsag_gen
    from tsl_sdr_tpu.utils.filter_design import firdes_low_pass

    decim, fs, center = 32, 38400 * 32, 929_500_000

    def burst(cap, txt):
        bb = pocsag_gen.generate(
            [pocsag_gen.PocsagBurst(capcode=cap, function=1, kind="alpha",
                                    content=txt)],
            baud=1200, amplitude=4096, tail_bits=256)
        dev = bb.astype(np.float64) / 16384.0 * 19200
        ph = np.cumsum(np.repeat(2 * np.pi * (250_000 + dev) / fs, decim))
        return np.stack([np.cos(ph), np.sin(ph)], -1) * 9000

    rng = np.random.default_rng(5)
    pad = rng.integers(-300, 300, size=(900_000, 2)).astype(np.int16)
    iq = np.concatenate([pad, burst(111, "BEFORE CKPT").astype(np.int16),
                         pad, burst(222, "AFTER CKPT").astype(np.int16),
                         pad])
    iq = (iq + rng.normal(scale=90, size=iq.shape)).astype(np.int16)
    lpf = firdes_low_pass(1.0, fs, 9_600, 7_000)
    spec = [ChannelSpec(center + 250_000, "pocsag")]

    want = [(m.capcode, m.data) for m in ReceivePipeline(
        lpf, center, fs, decim, spec, exact=False,
        block_size=393_216).process_capture(iq)[0]]
    assert [c for c, _ in want] == [111, 222]

    half = len(iq) // 2
    p1 = ReceivePipeline(lpf, center, fs, decim, spec, exact=False,
                         block_size=393_216)
    msgs = [(m.capcode, m.data) for m in p1.push(iq[:half])[0]]
    ck = tmp_path / "stream.npz"
    msgs += [(m.capcode, m.data) for m in p1.checkpoint_stream(ck)[0]]

    p2 = ReceivePipeline(lpf, center, fs, decim, spec, exact=False,
                         block_size=393_216)
    p2.restore_stream(ck)
    msgs += [(m.capcode, m.data) for m in p2.push(iq[half:])[0]]
    msgs += [(m.capcode, m.data) for m in p2.flush()[0]]
    assert msgs == want

    # a differently-configured pipeline refuses the checkpoint
    p3 = ReceivePipeline(lpf, center, fs, decim,
                         [ChannelSpec(center + 130_000, "pocsag")],
                         exact=False, block_size=393_216)
    with pytest.raises(ValueError, match="differently-configured"):
        p3.restore_stream(ck)
