import numpy as np

from tsl_sdr_tpu.ops.atan2 import ATAN_TABLE, fast_atan2, fast_atan2_np


def test_table_matches_reference_spot_values():
    # Spot values from the published table (multifm/fast_atan2f.c:15-80).
    spots = {
        0: 0.000000e00,
        1: 3.921549e-03,
        4: 1.568499e-02,
        128: 4.652150e-01,
        200: 6.651027e-01,
        255: 7.853982e-01,
        256: 7.853982e-01,
    }
    for i, v in spots.items():
        assert ATAN_TABLE[i] == np.float32(v), (i, ATAN_TABLE[i], v)


def test_jnp_matches_np_oracle():
    rng = np.random.default_rng(2)
    y = rng.integers(-(2**30), 2**30, size=8192).astype(np.float32)
    x = rng.integers(-(2**30), 2**30, size=8192).astype(np.float32)
    # include axes and the zero-zero case
    y = np.concatenate([y, np.array([0, 0, 1, -1, 0, 5], dtype=np.float32)])
    x = np.concatenate([x, np.array([0, 1, 0, 0, -1, 5], dtype=np.float32)])
    got = np.asarray(fast_atan2(y, x))
    want = fast_atan2_np(y, x)
    # XLA contracts the LUT interpolation's mul+add into an FMA, so the jnp
    # tier can differ from the strict C evaluation order by 1 ulp. The parity
    # contract lives downstream: FM PCM within 1 LSB (test_fm), messages exact.
    diff = np.abs(got.astype(np.float64) - want.astype(np.float64))
    assert diff.max() <= 3e-7, diff.max()
    assert (got == want).mean() > 0.8


def test_accuracy_vs_true_atan2():
    rng = np.random.default_rng(3)
    y = rng.normal(size=4096).astype(np.float32)
    x = rng.normal(size=4096).astype(np.float32)
    got = fast_atan2_np(y, x)
    err = np.abs(got.astype(np.float64) - np.arctan2(y, x))
    assert err.max() < 1e-5  # reference claims ~6.2e-7 rad average error
