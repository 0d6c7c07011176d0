"""CostasChannelizer: BPSK channel extracted and phase-locked."""

import numpy as np

from tsl_sdr_tpu.models.costas_channel import CostasChannelizer
from tsl_sdr_tpu.utils.filter_design import firdes_low_pass


def test_bpsk_channel_locks():
    fs, d = 256_000, 8
    offset = 40_000
    carrier_err = 35.0  # Hz — inside the loop's pull-in range
    sym_rate = 2_000
    n = fs // 2

    rng = np.random.default_rng(33)
    n_sym = int(n / fs * sym_rate) + 2
    symbols = rng.choice([-1.0, 1.0], size=n_sym)
    sps = fs // sym_rate
    bb = np.repeat(symbols, sps)[:n]
    t = np.arange(n) / fs
    ph = 2 * np.pi * (offset + carrier_err) * t
    iq = (np.stack([np.cos(ph) * bb, np.sin(ph) * bb], -1) * 9000)
    iq = (iq + rng.normal(scale=60, size=iq.shape)).astype(np.int16)

    lpf = firdes_low_pass(1.0, fs, 6_000, 4_000)  # full design: unity passband
    chain = CostasChannelizer(
        lpf, [offset], fs, d, alpha=0.1, beta=0.005, e_max_q14=8192
    )
    st = chain.init_state(prefix=iq[: chain.carry_len])
    q = chain.block_quantum
    n_blk = (n - chain.carry_len) // q * q
    st, out = chain.step(st, iq[chain.carry_len : chain.carry_len + n_blk])
    out = np.asarray(out)[0].astype(np.float64)  # [K, 2]

    # steady state (after lock): energy concentrates on the real axis
    tail = out[out.shape[0] // 2 :]
    re_p = np.mean(tail[:, 0] ** 2)
    im_p = np.mean(tail[:, 1] ** 2)
    assert re_p > 20 * im_p, (re_p, im_p)
    # and the recovered symbols have bimodal real values (BPSK)
    assert np.mean(np.abs(tail[:, 0])) > 1000


def test_native_path_locks_like_device_path():
    import shutil

    import pytest

    if shutil.which("g++") is None:
        pytest.skip("no C++ toolchain")

    fs, d = 256_000, 8
    offset = 40_000
    n = fs // 2
    rng = np.random.default_rng(34)
    sym = rng.choice([-1.0, 1.0], size=n // 128 + 2)
    bb = np.repeat(sym, 128)[:n]
    t = np.arange(n) / fs
    ph = 2 * np.pi * (offset + 35.0) * t
    iq = (np.stack([np.cos(ph) * bb, np.sin(ph) * bb], -1) * 9000
          + rng.normal(scale=60, size=(n, 2))).astype(np.int16)

    lpf = firdes_low_pass(1.0, fs, 6_000, 4_000)
    chain = CostasChannelizer(lpf, [offset], fs, d, alpha=0.1, beta=0.005,
                              e_max_q14=8192)
    out = chain.process_array_native(iq, block_size=8_192).astype(np.float64)
    tail = out[0, out.shape[1] // 2 :]
    re_p = np.mean(tail[:, 0] ** 2)
    im_p = np.mean(tail[:, 1] ** 2)
    assert re_p > 20 * im_p, (re_p, im_p)
