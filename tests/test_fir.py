import numpy as np
import jax.numpy as jnp

from tsl_sdr_tpu.ops import fir, q14
import oracles


def _random_iq(rng, n, scale=8000):
    return rng.integers(-scale, scale, size=(n, 2), dtype=np.int64).astype(np.int16)


def _random_lpf(rng, t):
    taps = rng.normal(size=t) * 0.05
    taps[t // 2] = 0.5
    return taps


def _stream_through(plan, x, exact=True, block=None):
    """Feed a whole stream through channel_fir_step in blocks; return [C, K, 2]."""
    n = block or 4 * plan.decimation * 8
    state = fir.init_channel_fir_state(plan, prefix=x[: plan.carry_len])
    pos = plan.carry_len
    outs = []
    while pos + n <= x.shape[0]:
        state, out = fir.channel_fir_step(plan, state, x[pos : pos + n], exact=exact)
        outs.append(np.asarray(out))
        pos += n
    return np.concatenate(outs, axis=1)


def test_exact_no_derotation_matches_oracle():
    rng = np.random.default_rng(10)
    t, d = 31, 5
    lpf = _random_lpf(rng, t)
    x = _random_iq(rng, 2048)
    plan = fir.make_channel_fir_plan(lpf, [0], sample_rate=48000, decimation=d)
    assert np.all(plan.rot_incr_i32[0] == np.array([q14.Q14_ONE, 0]))

    got = _stream_through(plan, x)[0]
    taps_i16 = plan.taps_i16[0]
    # offset 0 channel has rot_incr == (Q14_ONE, 0) -> derotation still runs
    want = oracles.direct_fir_oracle(x, taps_i16, d, rot_incr=plan.rot_incr_i32[0])
    np.testing.assert_array_equal(got, want[: got.shape[0]])


def test_exact_with_derotation_matches_oracle():
    rng = np.random.default_rng(11)
    t, d = 57, 8
    lpf = _random_lpf(rng, t)
    x = _random_iq(rng, 4096)
    fs, offset = 250_000, 31_250
    plan = fir.make_channel_fir_plan(lpf, [offset], sample_rate=fs, decimation=d)

    got = _stream_through(plan, x)[0]
    want = oracles.direct_fir_oracle(
        x, plan.taps_i16[0], d, rot_incr=plan.rot_incr_i32[0]
    )
    np.testing.assert_array_equal(got, want[: got.shape[0]])


def test_exact_multichannel_matches_per_channel_oracle():
    rng = np.random.default_rng(12)
    t, d = 25, 4
    lpf = _random_lpf(rng, t)
    x = _random_iq(rng, 2048)
    fs = 1_000_000
    offsets = [-100_000, 0, 12_500, 212_000]
    plan = fir.make_channel_fir_plan(lpf, offsets, sample_rate=fs, decimation=d)
    got = _stream_through(plan, x)
    for c in range(len(offsets)):
        want = oracles.direct_fir_oracle(
            x, plan.taps_i16[c], d, rot_incr=plan.rot_incr_i32[c]
        )
        np.testing.assert_array_equal(got[c], want[: got.shape[1]], err_msg=f"ch{c}")


def test_blocking_invariance():
    """Different block sizes must produce the identical output stream."""
    rng = np.random.default_rng(13)
    t, d = 41, 10
    lpf = _random_lpf(rng, t)
    x = _random_iq(rng, 8192)
    plan = fir.make_channel_fir_plan(lpf, [50_000], sample_rate=1e6, decimation=d)
    a = _stream_through(plan, x, block=2 * d)
    b = _stream_through(plan, x, block=64 * d)
    m = min(a.shape[1], b.shape[1])
    np.testing.assert_array_equal(a[:, :m], b[:, :m])


def test_fast_tier_tracks_exact():
    rng = np.random.default_rng(14)
    t, d = 61, 5
    lpf = _random_lpf(rng, t)
    x = _random_iq(rng, 8192, scale=12000)
    plan = fir.make_channel_fir_plan(lpf, [20_000], sample_rate=500_000, decimation=d)
    exact = _stream_through(plan, x, exact=True).astype(np.float64)
    # fast tier works with unity-scale float taps: already in sample units
    fast = _stream_through(plan, x, exact=False).astype(np.float64)
    # The exact tier reproduces the reference's un-renormalized rotator, whose
    # Q.14 magnitude decays over time (direct_fir.c:152-172 quirk); the fast
    # tier's analytic oscillator is drift-free. Compare early outputs only,
    # then confirm the drift exists (exact amplitude falls behind fast).
    head = slice(0, 256)
    rms_sig = np.sqrt(np.mean(exact[:, head] ** 2)) + 1e-9
    rms_err = np.sqrt(np.mean((exact[:, head] - fast[:, head]) ** 2))
    assert rms_err / rms_sig < 2e-2, (rms_err, rms_sig)
    tail = slice(exact.shape[1] - 256, exact.shape[1])
    assert np.sqrt(np.mean(exact[:, tail] ** 2)) < np.sqrt(
        np.mean(fast[:, tail] ** 2)
    )
