"""Packed-row Pallas resampler (ops/pallas_resampler.PallasResampler).

Reference hot loop: ``/root/reference/filter/polyphase_fir.c:162-233``.
The 'highest' tier is compared EXACTLY (to f32 rounding) against a float64
oracle and against the XLA packed-row tier on CPU in interpret mode. The
'high' (bf16x4) tier's real accuracy exists only on hardware — pallas
interpret mode emulates Precision.DEFAULT dots with bf16 ACCUMULATION,
which the TPU MXU does not do (it accumulates f32) — so on CPU the high
tier gets a coarse structural bound and the tight bound is asserted by
the TPU verify drive (see bench/r4_resampler_lab.py check mode).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tsl_sdr_tpu.ops import polyphase, q14
from tsl_sdr_tpu.ops.pallas_resampler import PallasResampler
from tsl_sdr_tpu.utils.filter_design import design_rational_resampler_filter


@pytest.fixture(scope="module")
def plan():
    coeffs = design_rational_resampler_filter(16, 25, 0.4)
    return polyphase.make_resampler_plan(
        q14.quantize_q14(coeffs), 16, 25, block_out_target=1 << 16
    )


def _oracle(plan, total, m):
    """float64 per-row oracle of the packed-row arithmetic."""
    w0 = plan.w_row_i16.astype(np.float64)
    w1 = plan.w_spill_i16.astype(np.float64)
    sp, row = w1.shape[0], plan.row_in
    out = np.zeros((m, plan.k_row))
    for r in range(m):
        seg = total[r * row:(r + 1) * row].astype(np.float64)
        seg2 = total[(r + 1) * row:(r + 1) * row + sp].astype(np.float64)
        out[r] = (seg @ w0 + seg2 @ w1) / 16384.0
    return out


def test_highest_matches_oracle(plan):
    rng = np.random.default_rng(0)
    tr, m = 8, 32
    total = rng.integers(-12000, 12000, size=((m + 1) * plan.row_in,),
                         dtype=np.int64).astype(np.int16)
    pr = PallasResampler(plan, tile_rows=tr, precision="highest",
                         interpret=True)
    carry = pr.init_carry(total[: plan.row_in])
    _, out = pr.step(carry, jnp.asarray(total[plan.row_in:]))
    ex = _oracle(plan, total, m)
    assert np.abs(np.asarray(out) - ex).max() < 0.01


def test_block_boundary_invariance(plan):
    """Same stream, different block splits -> identical output stream."""
    rng = np.random.default_rng(1)
    tr = 8
    m_total = 48
    total = rng.integers(-12000, 12000, size=((m_total + 1) * plan.row_in,),
                         dtype=np.int64).astype(np.int16)
    row = plan.row_in

    def run(rows_per_step):
        pr = PallasResampler(plan, tile_rows=tr, precision="highest",
                             interpret=True)
        carry = pr.init_carry(total[:row])
        outs = []
        pos = row
        while pos + rows_per_step * row <= len(total):
            carry, o = pr.step(carry, jnp.asarray(
                total[pos: pos + rows_per_step * row]))
            outs.append(np.asarray(o))
            pos += rows_per_step * row
        return np.concatenate(outs)

    a = run(tr)
    b = run(3 * tr)
    n = min(len(a), len(b))
    np.testing.assert_array_equal(a[:n], b[:n])


def test_matches_xla_packed_row_tier(plan):
    """Fed the same logical stream (offset by one row at the head), the
    pallas tier's output stream equals the XLA fast tier's."""
    rng = np.random.default_rng(2)
    nb = 2
    x = rng.integers(-12000, 12000,
                     size=(plan.carry_len + nb * plan.block_in,),
                     dtype=np.int64).astype(np.int16)
    st = polyphase.init_resampler_state(plan, prefix=x[: plan.carry_len])
    ref = []
    for b in range(nb):
        lo = plan.carry_len + b * plan.block_in
        st, o = polyphase.resample_step(plan, st, x[lo: lo + plan.block_in],
                                        exact=False)
        ref.append(np.asarray(o))
    ref = np.concatenate(ref)

    tr = 8
    pr = PallasResampler(plan, tile_rows=tr, precision="highest",
                         interpret=True)
    row = plan.row_in
    carry = pr.init_carry(x[:row])        # carry_len == spill history ++ head
    outs, pos, m_per = [], row, tr * 16
    while pos + m_per * row <= len(x):
        carry, o = pr.step(carry, jnp.asarray(x[pos: pos + m_per * row]))
        outs.append(np.asarray(o).reshape(-1))
        pos += m_per * row
    got = np.concatenate(outs)
    n = min(len(ref), len(got))
    assert n > plan.k_row * 32
    np.testing.assert_allclose(got[:n], ref[:n], atol=0.01)


def test_resampler_chain_pallas_backend_matches_xla(plan, monkeypatch):
    """ResamplerChain(backend='pallas') capture path == backend='xla'
    (pinned at 'highest' kernel precision: CPU interpret mode's emulated
    bf16 accumulation would otherwise add noise the real MXU lacks)."""
    from tsl_sdr_tpu.models.resampler import ResamplerChain
    from tsl_sdr_tpu.utils.filter_design import design_rational_resampler_filter

    monkeypatch.setattr(ResamplerChain, "_PALLAS_PRECISION", "highest")
    monkeypatch.setattr(ResamplerChain, "_PALLAS_TR", 64)
    coeffs = design_rational_resampler_filter(16, 25, 0.4)
    rng = np.random.default_rng(4)
    # enough for a few 64-row tiles plus a ragged tail
    pcm = rng.integers(-12000, 12000, size=(220_000,),
                       dtype=np.int64).astype(np.int16)
    kw = dict(block_out=1 << 14, exact=False, dc_block_pole=0.9999)
    ref = ResamplerChain(coeffs, 16, 25, backend="xla", **kw).process_array(pcm)
    got = ResamplerChain(coeffs, 16, 25, backend="pallas",
                         **kw).process_array(pcm)
    n = min(len(ref), len(got))
    assert n >= len(ref) - 2 * plan.k_row
    # atol 2.5: the fast-tier DC blocker quantizes its carry at call
    # boundaries, and the two paths segment the stream differently
    # (per-block vs main+tail) — a few +-2 LSB points at the seams
    np.testing.assert_allclose(np.asarray(got[:n], np.float64),
                               np.asarray(ref[:n], np.float64), atol=2.5)


def test_high_tier_structure(plan):
    """bf16x4 on CPU interpret carries emulated-bf16-accumulation noise
    (absent on the real MXU); bound it coarsely — an alignment/slicing
    bug shows up thousands of PCM units off, not tens."""
    rng = np.random.default_rng(3)
    tr, m = 8, 16
    total = rng.integers(-12000, 12000, size=((m + 1) * plan.row_in,),
                         dtype=np.int64).astype(np.int16)
    pr = PallasResampler(plan, tile_rows=tr, precision="high",
                         interpret=True)
    carry = pr.init_carry(total[: plan.row_in])
    _, out = pr.step(carry, jnp.asarray(total[plan.row_in:]))
    ex = _oracle(plan, total, m)
    err = np.abs(np.asarray(out) - ex).max()
    assert err < 150.0, err
