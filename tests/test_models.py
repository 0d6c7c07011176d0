import json
import os

import numpy as np
import pytest

from tsl_sdr_tpu.models.channelizer import MultifmChain
from tsl_sdr_tpu.models.resampler import ResamplerChain
from tsl_sdr_tpu.ops import q14
from tsl_sdr_tpu.utils.config import (
    MultifmConfig,
    RationalResamplerConfig,
    load_config,
)
from tsl_sdr_tpu.utils.filter_design import (
    design_rational_resampler_filter,
    firdes_low_pass,
)
from tsl_sdr_tpu.utils import iq as iqio
import oracles

REF_ETC = "/root/reference/etc"


def _nbfm_iq(fs, offset, tone, dev, n, amp=8000, seed=0):
    t = np.arange(n) / fs
    phase = 2 * np.pi * offset * t + (dev / tone) * np.sin(2 * np.pi * tone * t)
    iq = np.stack([np.cos(phase), np.sin(phase)], -1) * amp
    rng = np.random.default_rng(seed)
    return (iq + rng.normal(scale=100, size=iq.shape)).astype(np.int16)


def test_multifm_chain_recovers_tone():
    fs, d, offset, tone, dev = 500_000, 20, 60_000, 1_000.0, 4_000.0
    x = _nbfm_iq(fs, offset, tone, dev, fs // 4)
    lpf = firdes_low_pass(1.0, fs, 12_500, 6_000)
    chain = MultifmChain(lpf, [offset, -40_000], fs, d, exact=True)
    pcm = chain.process_array(x, block_size=20_000)
    assert pcm.shape[0] == 2
    audio = pcm[0].astype(np.float64)
    spec = np.abs(np.fft.rfft(audio - audio.mean()))
    peak = np.fft.rfftfreq(len(audio), d=d / fs)[spec.argmax()]
    assert abs(peak - tone) < 10, peak
    # the second channel points at noise: FM of noise is loud but has no
    # coherent tone — the 1 kHz bin must not dominate its spectrum
    other = pcm[1].astype(np.float64)
    spec1 = np.abs(np.fft.rfft(other - other.mean()))
    freqs = np.fft.rfftfreq(len(other), d=d / fs)
    tone_bin = np.argmin(np.abs(freqs - tone))
    assert spec1[tone_bin] < 0.5 * spec1.max()


def test_multifm_exact_matches_oracle_pipeline():
    """Whole-chain exact tier == direct_fir oracle + fm oracle (<=1 LSB)."""
    from tsl_sdr_tpu.ops import fm as fm_ops

    fs, d, offset = 100_000, 10, 12_000
    x = _nbfm_iq(fs, offset, 500.0, 2_000.0, 30_000, seed=3)
    lpf = firdes_low_pass(1.0, fs, 6_000, 4_000)
    chain = MultifmChain(lpf, [offset], fs, d, exact=True)
    pcm = chain.process_array(x, block_size=5_000)[0]

    ch = oracles.direct_fir_oracle(
        x, chain.plan.taps_i16[0], d, rot_incr=chain.plan.rot_incr_i32[0]
    )
    want, _ = fm_ops.fm_demod_np(ch[: pcm.shape[0]][None])
    diff = np.abs(pcm.astype(np.int32) - want[0].astype(np.int32))
    assert diff.max() <= 1, diff.max()


def test_multifm_fast_tier_runs():
    fs, d, offset = 200_000, 8, 25_000
    x = _nbfm_iq(fs, offset, 800.0, 3_000.0, 60_000)
    lpf = firdes_low_pass(1.0, fs, 10_000, 5_000)
    chain = MultifmChain(lpf, [offset], fs, d, exact=False)
    pcm = chain.process_array(x, block_size=16_000)[0].astype(np.float64)
    spec = np.abs(np.fft.rfft(pcm - pcm.mean()))
    peak = np.fft.rfftfreq(len(pcm), d=d / fs)[spec.argmax()]
    assert abs(peak - 800.0) < 10


@pytest.mark.parametrize("exact", [False, True])
def test_process_array_tail_not_dropped(exact):
    """Regression: captures longer than block_size used to lose the tail
    beyond n_blocks*block_size entirely (a 5M-sample capture through the
    4.19M default dropped its last ~0.9M samples — burst decodes near the
    capture end silently vanished). block_size must only affect blocking,
    never output length/content (< quantum residue excepted)."""
    fs, d, offset = 200_000, 8, 25_000
    x = _nbfm_iq(fs, offset, 800.0, 3_000.0, 50_000, seed=9)
    lpf = firdes_low_pass(1.0, fs, 10_000, 5_000)
    chain = MultifmChain(lpf, [offset], fs, d, exact=exact)
    # whole capture in one block = the no-tail oracle
    want = np.asarray(chain.process_array(x, block_size=len(x)))
    # block size chosen so the capture splits into >=2 full blocks + a tail
    got = np.asarray(chain.process_array(x, block_size=18_000))
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_array_equal(got, want)
    # device-resident variant follows the same contract
    got_dev = np.asarray(chain.process_array_device(x, block_size=18_000))
    np.testing.assert_array_equal(got_dev, want)


def test_costas_process_array_native_tail_not_dropped():
    from tsl_sdr_tpu.models.costas_channel import CostasChannelizer

    fs, d, offset = 200_000, 8, 25_000
    x = _nbfm_iq(fs, offset, 800.0, 3_000.0, 50_000, seed=11)
    lpf = firdes_low_pass(1.0, fs, 10_000, 5_000)
    chain = CostasChannelizer(lpf, [offset], fs, d)
    want = chain.process_array_native(x, block_size=len(x))
    got = chain.process_array_native(x, block_size=18_000)
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_array_equal(got, want)


def test_resampler_chain_matches_oracle():
    rng = np.random.default_rng(50)
    coeffs = design_rational_resampler_filter(16, 25, 0.4)
    x = rng.integers(-12000, 12000, size=60_000, dtype=np.int64).astype(np.int16)
    chain = ResamplerChain(coeffs, 16, 25, block_out=256, exact=True)
    got = chain.process_array(x)
    want = oracles.polyphase_oracle(x, q14.quantize_q14(coeffs), 16, 25)
    m = min(len(got), len(want))
    np.testing.assert_array_equal(got[:m], want[:m])


@pytest.mark.parametrize("exact", [True, False])
def test_resampler_chain_tail_not_dropped(exact):
    """Regression: the capture tail past n_blocks*block_in vanished (up to
    block_in-1 samples). Output must not depend on block geometry, and must
    cover the whole capture down to the d_rep input grid."""
    rng = np.random.default_rng(51)
    coeffs = design_rational_resampler_filter(16, 25, 0.4)
    x = rng.integers(-12000, 12000, size=61_337, dtype=np.int64).astype(
        np.int16)
    a = ResamplerChain(coeffs, 16, 25, block_out=256, exact=exact)
    b = ResamplerChain(coeffs, 16, 25, block_out=4096, exact=exact)
    ga, gb = a.process_array(x), b.process_array(x)
    assert ga.shape == gb.shape
    np.testing.assert_array_equal(ga, gb)
    if exact:
        want = oracles.polyphase_oracle(x, q14.quantize_q14(coeffs), 16, 25)
        assert len(want) - len(ga) < 2 * 16, (len(ga), len(want))
        np.testing.assert_array_equal(ga, want[: len(ga)])
    # device-resident variant follows the same contract
    import jax.numpy as jnp

    gd = np.asarray(a.process_array_device(jnp.asarray(x)))
    np.testing.assert_array_equal(gd, ga)


@pytest.mark.skipif(not os.path.isdir(REF_ETC), reason="reference etc/ absent")
def test_reference_configs_load():
    cfg = MultifmConfig.load(
        f"{REF_ETC}/multifm.json", f"{REF_ETC}/flex_25khz_lpf.json"
    )
    assert cfg.sample_rate_hz == 1_000_000
    assert cfg.decimation_factor == 40
    assert len(cfg.channels) == 8
    assert len(cfg.lpf_taps) == 128
    assert cfg.channel_offsets_hz[0] == 929_838_000 - 929_500_000

    rs = RationalResamplerConfig.load(f"{REF_ETC}/resampler_filter.json")
    assert (rs.interpolate, rs.decimate) == (16, 25)
    assert len(rs.lpf_coeffs) == 821


@pytest.mark.skipif(not os.path.isdir(REF_ETC), reason="reference etc/ absent")
def test_filter_design_replicates_gnuradio_output():
    ref = np.asarray(
        load_config(f"{REF_ETC}/resampler_filter.json")["lpfCoeffs"]
    )
    mine = design_rational_resampler_filter(16, 25, 0.4)
    assert mine.shape == ref.shape
    np.testing.assert_allclose(mine, ref, atol=1e-6)


def test_iq_formats(tmp_path):
    raw = np.arange(256, dtype=np.uint8)
    p = tmp_path / "x.bin"
    raw.tofile(p)
    cs8 = iqio.read_iq_file(p, "cs8")
    assert cs8[64, 0] == -128  # 0x80 as int8
    cu8 = iqio.read_iq_file(p, "cu8")
    # reference quirk: bytes >= 0x80 go through int8 first (file_if.c:140-146)
    assert cu8[0, 0] == -127 and cu8[64, 0] == -128 - 127
    cu8u = iqio.read_iq_file(p, "cu8_unbiased")
    assert cu8u[64, 0] == 128 - 127
    rtl = iqio.rtl_u8_to_q14(raw)
    assert rtl[0] == -127 << 7 and rtl[255] == 128 << 7


def test_debug_coefficient_dumps(tmp_path, monkeypatch):
    """Runtime equivalents of the reference's compile-time dump hooks
    (_DUMP_LPF multifm/demod.c:229-258, _DUMP_FILTER_COEFFICIENTS
    filter/polyphase_fir.c:86-94), gated on env vars."""
    from tsl_sdr_tpu.ops import packed_fir, polyphase

    lpf_dump = tmp_path / "lpf.txt"
    ph_dump = tmp_path / "phases.txt"
    monkeypatch.setenv("TSL_DUMP_LPF", str(lpf_dump))
    monkeypatch.setenv("TSL_DUMP_FILTER_COEFFICIENTS", str(ph_dump))

    lpf = firdes_low_pass(1.0, 256_000, 12_500, 9_000)[:32]
    packed_fir.make_packed_fir_plan(lpf, [40_000, -30_000], 256_000, 8)
    txt = lpf_dump.read_text()
    assert "lpf_shifted_40000 = [" in txt
    assert "lpf_shifted_-30000 = [" in txt
    assert "Total power:" in txt
    assert txt.count("complex(") == 64  # 32 taps x 2 channels

    coeffs = design_rational_resampler_filter(3, 2, 0.4)
    polyphase.make_resampler_plan(q14.quantize_q14(coeffs), 3, 2)
    ph = ph_dump.read_text()
    assert ph.count("Phase ") == 3  # one line per interpolation phase

    # unset -> no output, no crash
    monkeypatch.delenv("TSL_DUMP_LPF")
    monkeypatch.delenv("TSL_DUMP_FILTER_COEFFICIENTS")
    packed_fir.make_packed_fir_plan(lpf, [10_000], 256_000, 8)
    polyphase.make_resampler_plan(q14.quantize_q14(coeffs), 3, 2)
