import numpy as np

from tsl_sdr_tpu.ops import dc_blocker
import oracles


def test_exact_matches_oracle():
    rng = np.random.default_rng(30)
    x = rng.integers(-20000, 20000, size=4096, dtype=np.int64).astype(np.int16)
    x = (x + 5000).astype(np.int16)  # add DC
    pole = 0.9999
    p = dc_blocker.make_pole_coeff(pole)
    state = dc_blocker.init_dc_blocker_state()
    got = []
    for i in range(0, len(x), 1024):
        state, out = dc_blocker.dc_blocker_step_exact(state, x[i : i + 1024], p)
        got.append(np.asarray(out))
    got = np.concatenate(got)
    want = oracles.dc_blocker_oracle(x, pole)
    np.testing.assert_array_equal(got, want)


def test_removes_dc():
    rng = np.random.default_rng(31)
    n = 65536
    sig = (2000 * np.sin(2 * np.pi * 0.01 * np.arange(n)) + 6000).astype(np.int16)
    p = dc_blocker.make_pole_coeff(0.999)
    state = dc_blocker.init_dc_blocker_state()
    state, out = dc_blocker.dc_blocker_step_exact(state, sig, p)
    out = np.asarray(out, dtype=np.float64)
    # settled tail: DC (6000) knocked down by >40 dB, sine passes through
    tail = out[3 * n // 4 :]
    assert abs(tail.mean()) < 60, tail.mean()
    assert tail.std() > 1000  # the AC component survives


def test_fast_tier_tracks_exact():
    rng = np.random.default_rng(32)
    x = (rng.integers(-8000, 8000, size=8192) + 3000).astype(np.int16)
    pole = 0.999
    p = dc_blocker.make_pole_coeff(pole)
    se = dc_blocker.init_dc_blocker_state()
    sf = dc_blocker.init_dc_blocker_state()
    se, a = dc_blocker.dc_blocker_step_exact(se, x, p)
    sf, b = dc_blocker.dc_blocker_step_fast(sf, x, p)
    err = np.abs(np.asarray(a, dtype=np.float64) - np.asarray(b, dtype=np.float64))
    assert err.mean() < 4.0, err.mean()
