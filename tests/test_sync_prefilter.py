"""Device sync-candidate prefilter properties (ops/sync_prefilter.py).

The egress-gating correctness argument rests on the STRICT-SUPERSET
property: if the decoder's FSM would trigger anywhere in a block, the
prefilter must flag that block — then skipping unflagged blocks can never
lose a message. These tests pin the property on real bursts (all bauds,
injected bit errors, boundary straddles) and pin the false-positive
behavior on pure noise.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tsl_sdr_tpu.ops import sync_prefilter as sp
from tsl_sdr_tpu.testing import ais_gen, flex_gen, pocsag_gen


def _pocsag_flag(pred_2d, k_new):
    return np.asarray(sp.pocsag_any_candidate(jnp.asarray(pred_2d), k_new))


def _ais_flag(pred_2d, k_new):
    return np.asarray(sp.ais_any_candidate(jnp.asarray(pred_2d), k_new))


@pytest.mark.parametrize("baud", [512, 1200, 2400])
def test_pocsag_burst_flags(baud):
    pcm = pocsag_gen.generate(
        [pocsag_gen.PocsagBurst(capcode=123, function=1, kind="alpha",
                                content="X")],
        baud=baud, tail_bits=64)
    pred = (pcm < 0).astype(np.uint8)[None, :]
    full = np.concatenate(
        [np.zeros((1, sp.POCSAG_TAIL), np.uint8), pred], axis=1)
    assert _pocsag_flag(full, pred.shape[1])[0]


def test_pocsag_burst_with_bit_errors_still_flags():
    """The decoder tolerates hamming<=4 in the sync register; so does the
    prefilter (same threshold)."""
    rng = np.random.default_rng(0)
    pcm = pocsag_gen.generate(
        [pocsag_gen.PocsagBurst(capcode=99, function=0, kind="numeric",
                                content="123")],
        baud=1200, tail_bits=64)
    for trial in range(5):
        noisy = pcm.copy().astype(np.int32)
        flips = rng.choice(len(pcm), size=len(pcm) // 50, replace=False)
        noisy[flips] = -noisy[flips]  # sign flips ~ bit errors
        pred = (noisy < 0).astype(np.uint8)[None, :]
        full = np.concatenate(
            [np.zeros((1, sp.POCSAG_TAIL), np.uint8), pred], axis=1)
        # the decoder itself must still sync for the property to bind
        from tsl_sdr_tpu.models.pocsag import PocsagDecoder

        msgs = PocsagDecoder().scan(noisy.astype(np.int16))
        if msgs:
            assert _pocsag_flag(full, pred.shape[1])[0], trial


def test_pocsag_noise_false_positive_rate():
    rng = np.random.default_rng(1)
    fp = 0
    for _ in range(4):
        noise = rng.integers(0, 2, size=(8, sp.POCSAG_TAIL + 100_000),
                             dtype=np.int64).astype(np.uint8)
        fp += int(_pocsag_flag(noise, 100_000).sum())
    assert fp == 0, fp  # pair-test: ~1e-10 per probe


def test_pocsag_sync_straddling_block_boundary_flags_second_block():
    """Split a burst so the sync word spans the boundary; with the carried
    tail, the second block must flag."""
    pcm = pocsag_gen.generate(
        [pocsag_gen.PocsagBurst(capcode=7, function=1, kind="alpha",
                                content="Y")],
        baud=1200, tail_bits=0)
    pred = (pcm < 0).astype(np.uint8)
    # sync word ends around 576*32 samples in (preamble + sync); split mid
    split = 590 * 32
    t = sp.POCSAG_TAIL
    blk1 = np.concatenate([np.zeros(t, np.uint8), pred[:split]])[None, :]
    f1 = _pocsag_flag(blk1, split)[0]
    tail = np.concatenate([np.zeros(t, np.uint8), pred[:split]])[-t:]
    blk2 = np.concatenate([tail, pred[split:]])[None, :]
    f2 = _pocsag_flag(blk2, len(pred) - split)[0]
    assert f1 or f2  # the union of blocks always covers the trigger


def test_ais_signal_flags_and_noise_does_not():
    sig = ais_gen.generate([ais_gen.make_position_report(366000001)])
    pred = (sig > 0).astype(np.uint8)[None, :]
    full = np.concatenate(
        [np.zeros((1, sp.AIS_TAIL), np.uint8), pred], axis=1)
    assert _ais_flag(full, pred.shape[1])[0]

    rng = np.random.default_rng(2)
    fp = 0
    for _ in range(4):
        noise = rng.integers(0, 2, size=(8, sp.AIS_TAIL + 100_000),
                             dtype=np.int64).astype(np.uint8)
        fp += int(_ais_flag(noise, 100_000).sum())
    assert fp == 0, fp


def _flex_flag(pred_2d, k_new):
    return np.asarray(sp.flex_any_candidate(jnp.asarray(pred_2d), k_new))


def _flex_match_positions(pred):
    """Exact 32-tap stride-10 register == BS1, the FSM's own trigger test
    (models/flex.py _sync_update SEARCH_BS1)."""
    n = len(pred)
    start = 31 * sp.FLEX_SPB
    w = np.zeros(n, np.uint32)
    for k in range(32):
        w[start:] |= pred[start - k * sp.FLEX_SPB : n - k * sp.FLEX_SPB
                          ].astype(np.uint32) << np.uint32(k)
    match = w == np.uint32(sp.FLEX_BS1)
    match[:start] = False
    return match


@pytest.mark.parametrize("fsk_levels", [2, 4])
def test_flex_burst_flags(fsk_levels):
    baud = 1600 if fsk_levels == 2 else 3200
    pcm, _ = flex_gen.generate(
        [flex_gen.FlexBurstMessage(capcode=4321, kind="alnum", content="X")],
        baud=baud, fsk_levels=fsk_levels, tail_bits=64)
    pred = (np.asarray(pcm, np.int16) >= 0).astype(np.uint8)[None, :]
    full = np.concatenate(
        [np.zeros((1, sp.FLEX_TAIL), np.uint8), pred], axis=1)
    assert _flex_flag(full, pred.shape[1])[0]


def test_flex_noise_false_positive_rate():
    """The FLEX trigger is an EXACT 32-bit register match, so random bits
    false-flag at ~2^-32 per probe — effectively never."""
    rng = np.random.default_rng(4)
    fp = 0
    for _ in range(4):
        noise = rng.integers(0, 2, size=(8, sp.FLEX_TAIL + 100_000),
                             dtype=np.int64).astype(np.uint8)
        fp += int(_flex_flag(noise, 100_000).sum())
    assert fp == 0, fp


def test_flex_flag_soundness_split_sweep():
    """For ANY block split around the first exact-BS1 trigger, the block
    containing the trigger sample must flag (FLEX triggers are immediate:
    the FSM leaves SEARCH on the matching sample itself)."""
    pcm, _ = flex_gen.generate(
        [flex_gen.FlexBurstMessage(capcode=777, kind="alnum",
                                   content="GATE")],
        baud=1600, fsk_levels=2, tail_bits=0)
    pred = (np.asarray(pcm, np.int16) >= 0).astype(np.uint8)
    match = _flex_match_positions(pred)
    qs = np.flatnonzero(match)
    assert qs.size
    q = int(qs[0])
    t = sp.FLEX_TAIL
    n2 = min(len(pred), q + 100)  # isolate the first trigger
    rng = np.random.default_rng(5)
    splits = np.unique(np.concatenate([
        np.arange(q - 1, q + 3),                     # the boundary itself
        rng.integers(q - 400, q + 90, size=24),      # random neighborhood
    ]))
    for s in splits:
        s = int(s)
        head = np.concatenate([np.zeros(t, np.uint8), pred[:s]])
        if s <= q:   # trigger is in block 2
            blk = np.concatenate([head[-t:], pred[s:n2]])[None, :]
            assert _flex_flag(blk, n2 - s)[0], s
        else:        # trigger is in block 1
            blk = head[None, :]
            assert _flex_flag(blk, s)[0], s


def test_pocsag_trigger_on_first_new_sample_flags():
    """Regression: the FSM fires on the first NON-matching sample after a
    long match run. If the run ends exactly at the block boundary, every
    matching position is in the old span and the trigger is the new
    block's first sample — that block must still flag (it used to not)."""
    pcm = pocsag_gen.generate(
        [pocsag_gen.PocsagBurst(capcode=55, function=2, kind="alpha",
                                content="Z")],
        baud=1200, tail_bits=0)
    pred = (pcm < 0).astype(np.uint8)
    spb = 32
    start = 31 * spb
    n = len(pred)
    # position-wise 32-tap register match, exactly the FSM's test
    w = np.zeros(n, np.uint32)
    for k in range(32):
        w[start:] |= pred[start - k * spb : n - k * spb].astype(
            np.uint32
        ) << np.uint32(k)
    x = (w ^ np.uint32(sp.POCSAG_SYNC)).astype(np.uint32)
    ham = np.zeros(n, np.uint32)
    for b in range(32):
        ham += (x >> np.uint32(b)) & np.uint32(1)
    match = ham <= sp.POCSAG_MAX_HAM
    match[:start] = False
    # trigger = first non-match after a run of > spb//2 matches
    run, q = 0, None
    for p in range(start, n):
        if match[p]:
            run += 1
        else:
            if run > spb // 2:
                q = p
                break
            run = 0
    assert q is not None
    # truncate shortly after the trigger so the new span contains no later
    # sync run of its own — isolates the boundary case
    n2 = min(n, q + 100)
    t = sp.POCSAG_TAIL
    head = np.concatenate([np.zeros(t, np.uint8), pred[:q]])
    blk2 = np.concatenate([head[-t:], pred[q:n2]])[None, :]
    assert _pocsag_flag(blk2, n2 - q)[0]


def test_pocsag_flag_soundness_split_sweep():
    """For ANY block split around the trigger, the block containing the
    trigger sample must flag (gating soundness, not just union-coverage)."""
    pcm = pocsag_gen.generate(
        [pocsag_gen.PocsagBurst(capcode=31337, function=0, kind="numeric",
                                content="42")],
        baud=1200, tail_bits=0)
    pred = (pcm < 0).astype(np.uint8)
    spb = 32
    start = 31 * spb
    n = len(pred)
    w = np.zeros(n, np.uint32)
    for k in range(32):
        w[start:] |= pred[start - k * spb : n - k * spb].astype(
            np.uint32
        ) << np.uint32(k)
    x = (w ^ np.uint32(sp.POCSAG_SYNC)).astype(np.uint32)
    ham = np.zeros(n, np.uint32)
    for b in range(32):
        ham += (x >> np.uint32(b)) & np.uint32(1)
    match = ham <= sp.POCSAG_MAX_HAM
    match[:start] = False
    run, q = 0, None
    for p in range(start, n):
        if match[p]:
            run += 1
        else:
            if run > spb // 2:
                q = p
                break
            run = 0
    assert q is not None
    t = sp.POCSAG_TAIL
    n2 = min(n, q + 100)  # no later sync run in the tested span
    rng = np.random.default_rng(3)
    splits = np.unique(np.concatenate([
        np.arange(q - 2, q + 3),                       # the boundary itself
        rng.integers(q - 2 * spb, q + 64, size=24),    # random neighborhood
    ]))
    for s in splits:
        s = int(s)
        head = np.concatenate([np.zeros(t, np.uint8), pred[:s]])
        if s <= q:   # trigger is in block 2
            blk = np.concatenate([head[-t:], pred[s:n2]])[None, :]
            assert _pocsag_flag(blk, n2 - s)[0], s
        else:        # trigger is in block 1
            blk = head[None, :]
            assert _pocsag_flag(blk, s)[0], s
