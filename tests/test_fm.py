import numpy as np

from tsl_sdr_tpu.ops import fm


def test_matches_oracle_within_one_lsb():
    rng = np.random.default_rng(40)
    x = rng.integers(-16000, 16000, size=(8192, 2), dtype=np.int64).astype(np.int16)
    state = fm.init_fm_state()
    state, got = fm.fm_demod_step(state, x)
    want, _ = fm.fm_demod_np(x)
    diff = np.abs(np.asarray(got, np.int32) - want.astype(np.int32))
    assert diff.max() <= 1, diff.max()
    # the vast majority must be exactly equal
    assert (diff == 0).mean() > 0.995


def test_state_carry_across_blocks():
    rng = np.random.default_rng(41)
    x = rng.integers(-16000, 16000, size=(4096, 2), dtype=np.int64).astype(np.int16)
    state = fm.init_fm_state()
    outs = []
    for i in range(0, len(x), 512):
        state, o = fm.fm_demod_step(state, x[i : i + 512])
        outs.append(np.asarray(o))
    blocked = np.concatenate(outs)
    state2 = fm.init_fm_state()
    _, whole = fm.fm_demod_step(state2, x)
    np.testing.assert_array_equal(blocked, np.asarray(whole))


def test_constant_frequency_tone():
    """A pure tone at frequency f maps to PCM ~= (2*f/fs) * 2^14."""
    fs = 25000.0
    f = 3125.0  # fs/8
    n = 2048
    t = np.arange(n)
    iq = np.stack(
        [
            np.cos(2 * np.pi * f / fs * t) * 12000,
            np.sin(2 * np.pi * f / fs * t) * 12000,
        ],
        axis=-1,
    ).astype(np.int16)
    state = fm.init_fm_state()
    _, pcm = fm.fm_demod_step(state, iq)
    pcm = np.asarray(pcm, dtype=np.float64)[1:]  # skip the history-seed sample
    expect = (2 * f / fs) * 16384
    assert abs(pcm.mean() - expect) < 32, (pcm.mean(), expect)
    assert pcm.std() < 16
