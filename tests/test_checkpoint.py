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
