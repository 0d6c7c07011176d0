import numpy as np
import jax.numpy as jnp

from tsl_sdr_tpu.ops import q14
import oracles


def test_round_q28_q14_matches_oracle():
    rng = np.random.default_rng(0)
    vals = np.concatenate(
        [
            rng.integers(-(2**31), 2**31 - 1, size=4096, dtype=np.int64),
            np.array([0, 1, -1, 2**13, 2**13 - 1, -(2**13), 2**31 - 1, -(2**31)]),
        ]
    ).astype(np.int32)
    got = np.asarray(q14.round_q28_q14(jnp.asarray(vals)))
    want = np.asarray([oracles.round_q28_q14(int(v)) for v in vals], dtype=np.int16)
    np.testing.assert_array_equal(got, want)


def test_cmul_q14_q14_matches_oracle():
    rng = np.random.default_rng(1)
    a = rng.integers(-32768, 32768, size=(1024, 4), dtype=np.int64).astype(np.int16)
    rr, ri = q14.cmul_q14_q14(
        jnp.asarray(a[:, 0]), jnp.asarray(a[:, 1]),
        jnp.asarray(a[:, 2]), jnp.asarray(a[:, 3]),
    )
    want = np.asarray(
        [oracles.cmul_q14_q14(*map(int, row)) for row in a], dtype=np.int16
    )
    np.testing.assert_array_equal(np.asarray(rr), want[:, 0])
    np.testing.assert_array_equal(np.asarray(ri), want[:, 1])


def test_quantize_q14_truncates_toward_zero():
    taps = np.array([0.5, -0.5, 0.9999, -0.9999, 1.0 / 3, -1.0 / 3, 0.0])
    got = q14.quantize_q14(taps)
    want = np.array([8192, -8192, 16382, -16382, 5461, -5461, 0], dtype=np.int16)
    np.testing.assert_array_equal(got, want)
