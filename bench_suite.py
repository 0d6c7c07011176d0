#!/usr/bin/env python3
"""Benchmark suite: the five BASELINE.json configs on real hardware.

Writes BENCH_SUITE.md with one row per config. ``bench.py`` remains the
driver-facing single-line headline; this suite is the full coverage run.

Device timing uses the honest harness (state-threaded on-device rep scan,
differential long/short runs, best of trials — see bench.py); host decoders
are timed directly. The device->host tunnel on this box moves bulk data at
<3 MB/s, so device benches consume results on-device via checksums.
"""

import json
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent
REP_LO, REP_HI, TRIALS = 2, 10, 4


def _device_rate(step_fn, state0, blocks, samples_per_pass):
    import jax
    import jax.numpy as jnp

    def make(reps):
        @jax.jit
        def run(state, blocks):
            def rep(carry, _):
                st, acc = carry
                st, out = jax.lax.scan(step_fn, st, blocks)
                return (st, acc + jnp.sum(out.astype(jnp.int32))), None

            (st, acc), _ = jax.lax.scan(
                rep, (state, jnp.int32(0)), None, length=reps
            )
            tot = acc.astype(jnp.float32)
            for leaf in jax.tree.leaves(st):
                tot = tot + jnp.sum(leaf.astype(jnp.float32))
            return tot

        return run

    run_lo, run_hi = make(REP_LO), make(REP_HI)
    float(run_lo(state0, blocks))
    float(run_hi(state0, blocks))
    best = float("inf")
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        float(run_lo(state0, blocks))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(run_hi(state0, blocks))
        t_hi = time.perf_counter() - t0
        dt = (t_hi - t_lo) / (REP_HI - REP_LO)
        if 0 < dt < best:
            best = dt
    return samples_per_pass / best / 1e6


def bench_multifm(nr_channels: int) -> float:
    """Best of the two production backends (XLA wins at small channel
    counts, the fused Pallas kernel at large ones)."""
    import jax
    import jax.numpy as jnp
    from tsl_sdr_tpu.models.channelizer import MultifmChain
    from tsl_sdr_tpu.utils.filter_design import firdes_low_pass

    fs, d, t = 1_000_000, 40, 128
    lpf = firdes_low_pass(1.0, fs, 12_500, 9_000)[:t]
    rng = np.random.default_rng(0)
    offsets = rng.integers(-fs // 3, fs // 3, size=nr_channels)
    block = 16_776_960
    best = 0.0
    for backend in ("xla", "pallas"):
        chain = MultifmChain(lpf, offsets, fs, d, exact=False,
                             backend=backend)
        iq = rng.integers(-8000, 8000, size=(chain.carry_len + block, 2),
                          dtype=np.int64).astype(np.int16)
        st0 = chain.init_state(prefix=iq[: chain.carry_len])
        blocks = jax.device_put(
            jnp.asarray(iq[chain.carry_len :].reshape(1, 2 * block))
        )
        best = max(best, _device_rate(chain._step_raw, st0, blocks, block))
    return best


def bench_exact_fir() -> float:
    """Device throughput of the bit-exact integer FIR (packed_fir_step_exact)."""
    import jax
    import jax.numpy as jnp
    from tsl_sdr_tpu.models.channelizer import MultifmChain
    from tsl_sdr_tpu.ops import packed_fir
    from tsl_sdr_tpu.utils.filter_design import firdes_low_pass

    fs, d, t, c = 1_000_000, 40, 128, 8
    lpf = firdes_low_pass(1.0, fs, 12_500, 9_000)[:t]
    rng = np.random.default_rng(0)
    offsets = rng.integers(-fs // 3, fs // 3, size=c)
    chain = MultifmChain(lpf, offsets, fs, d, exact=True)
    plan = chain.packed_plan
    block = 16_776_960
    iq = rng.integers(-8000, 8000, size=(plan.carry_len + block, 2),
                      dtype=np.int64).astype(np.int16)
    carry = packed_fir.init_packed_carry(plan, iq[: plan.carry_len])
    blocks = jax.device_put(
        jnp.asarray(iq[plan.carry_len :].reshape(1, 2 * block))
    )

    def step(cv, bv):
        cv, a_re, a_im = packed_fir.packed_fir_step_exact(plan, cv, bv)
        return cv, (a_re.astype(jnp.int32) + a_im.astype(jnp.int32))

    return _device_rate(step, carry, blocks, block)


def bench_resampler() -> float:
    import jax
    import jax.numpy as jnp
    from tsl_sdr_tpu.ops import polyphase, q14
    from tsl_sdr_tpu.utils.filter_design import design_rational_resampler_filter

    coeffs = design_rational_resampler_filter(16, 25, 0.4)
    plan = polyphase.make_resampler_plan(
        q14.quantize_q14(coeffs), 16, 25, block_out_target=1 << 20
    )
    rng = np.random.default_rng(0)
    nb = 8
    x = rng.integers(-12000, 12000, size=(plan.carry_len + nb * plan.block_in,),
                     dtype=np.int64).astype(np.int16)
    blocks = jax.device_put(
        jnp.asarray(x[plan.carry_len :].reshape(nb, plan.block_in))
    )
    st0 = polyphase.init_resampler_state(plan, prefix=x[: plan.carry_len])

    def step(st, blk):
        st2, out = polyphase.resample_step(plan, st, blk, exact=False)
        return st2, out.astype(jnp.int32)

    return _device_rate(step, st0, blocks, nb * plan.block_in)


def bench_pocsag_chain() -> dict:
    """Wideband -> channelize+demod (TPU) -> POCSAG scan (host)."""
    from tsl_sdr_tpu.models.channelizer import MultifmChain
    from tsl_sdr_tpu.models.pocsag import PocsagDecoder
    from tsl_sdr_tpu.testing import pocsag_gen
    from tsl_sdr_tpu.utils.filter_design import firdes_low_pass

    decim = 32
    fs = 38400 * decim
    offset = 250_000
    bursts = [pocsag_gen.PocsagBurst(capcode=1234567, function=1,
                                     kind="alpha", content="BENCH MSG")]
    bb = pocsag_gen.generate(bursts, baud=1200, amplitude=4096, tail_bits=256)
    dev = bb.astype(np.float64) / 16384.0 * (38400 / 2)
    ph = np.cumsum(np.repeat(2 * np.pi * (offset + dev) / fs, decim))
    sig = (np.stack([np.cos(ph), np.sin(ph)], -1) * 9000).astype(np.int16)
    rng = np.random.default_rng(1)
    pad = rng.integers(-500, 500, size=(4_000_000, 2),
                       dtype=np.int64).astype(np.int16)
    iq = np.concatenate([pad, sig, pad])

    lpf = firdes_low_pass(1.0, fs, 9_600, 7_000)
    chain = MultifmChain(lpf, [offset], fs, decim, exact=False)
    # warm compile with the SAME block shape the measurement uses — a
    # different shape recompiles and the measurement becomes compile time
    # (this exact bug made round 1 record 0.8 Msps for this row)
    chain.process_array(iq, block_size=4_000_000)
    best = 0.0
    msgs = []
    for _ in range(3):
        t0 = time.perf_counter()
        pcm = chain.process_array(iq, block_size=4_000_000)[0]
        msgs = PocsagDecoder().scan(pcm)
        dt = time.perf_counter() - t0
        best = max(best, len(iq) / dt / 1e6)
    assert any(m.capcode == 1234567 for m in msgs), "decode failed"
    return {"msps": best, "messages": len(msgs)}


def bench_pipeline_8ch() -> dict:
    """The reference's flagship deployment shape, end-to-end in one call:
    1.2288 Msps wideband -> 8 POCSAG channels channelized on TPU ->
    device-side sign bit-pack -> 8 host decoders."""
    from tsl_sdr_tpu.models.pipeline import ChannelSpec, ReceivePipeline
    from tsl_sdr_tpu.testing import pocsag_gen
    from tsl_sdr_tpu.utils.filter_design import firdes_low_pass

    decim = 32
    fs = 38400 * decim
    center = 929_500_000
    offsets = [-450_000, -320_000, -190_000, -60_000,
               60_000, 190_000, 320_000, 450_000]
    rng = np.random.default_rng(6)
    parts = None
    for k, off in enumerate(offsets):
        bb = pocsag_gen.generate(
            [pocsag_gen.PocsagBurst(capcode=100000 + k, function=1,
                                    kind="alpha", content=f"CH{k} MSG")],
            baud=1200, tail_bits=256)
        dev = bb.astype(np.float64) / 16384.0 * 19200
        ph = np.cumsum(np.repeat(2 * np.pi * (off + dev) / fs, decim))
        sig = np.stack([np.cos(ph), np.sin(ph)], -1) * 4000
        if parts is None:
            parts = np.zeros((len(sig) + 2_000_000, 2))
        parts[200_000:200_000 + len(sig)] += sig
    iq = (parts + rng.normal(scale=80, size=parts.shape)).astype(np.int16)

    pipe = ReceivePipeline(
        firdes_low_pass(1.0, fs, 9_600, 7_000), center, fs, decim,
        [ChannelSpec(center + o, "pocsag") for o in offsets], exact=False)
    pipe.process_capture(iq)  # warm the exact measurement shape
    best = 0.0
    res = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = pipe.process_capture(iq)
        best = max(best, len(iq) / (time.perf_counter() - t0) / 1e6)
    caps = sorted(m.capcode for msgs in res for m in msgs)
    assert caps == [100000 + k for k in range(8)], caps
    return {"msps": best}


def bench_decoder_scans() -> dict:
    from tsl_sdr_tpu.models.ais import AisDecoder
    from tsl_sdr_tpu.models.flex import FlexDecoder
    from tsl_sdr_tpu.models.pocsag import PocsagDecoder

    rng = np.random.default_rng(2)
    pcm = rng.integers(-8000, 8000, size=8_000_000,
                       dtype=np.int64).astype(np.int16)
    out = {}
    for name, dec in (("pocsag", PocsagDecoder()), ("flex", FlexDecoder()),
                      ("ais", AisDecoder())):
        t0 = time.perf_counter()
        dec.scan(pcm)
        out[name] = len(pcm) / (time.perf_counter() - t0) / 1e6
    return out


def bench_decoder_dense() -> dict:
    """100%-duty burst traffic (VERDICT r1 item 9's >= 20 Msps target)."""
    from tsl_sdr_tpu.models.ais import AisDemodulator
    from tsl_sdr_tpu.models.pocsag import PocsagDecoder
    from tsl_sdr_tpu.testing import ais_gen, pocsag_gen

    out = {}
    bursts = [pocsag_gen.PocsagBurst(capcode=1000 + k, function=1,
                                     kind="alpha",
                                     content="DENSE TRAFFIC %03d " % k * 3)
              for k in range(40)]
    pcm = pocsag_gen.generate(bursts, baud=2400, tail_bits=16)
    d = PocsagDecoder()
    t0 = time.perf_counter()
    msgs = d.scan(pcm)
    out["pocsag"] = len(pcm) / (time.perf_counter() - t0) / 1e6
    assert len(msgs) == 40

    from tsl_sdr_tpu.models.flex import FlexDecoder
    from tsl_sdr_tpu.testing import flex_gen

    fmsgs = [flex_gen.FlexBurstMessage(capcode=10000 + k, kind="alnum",
                                       content="DENSE FLEX %03d" % k)
             for k in range(4)]
    frames = [flex_gen.generate(fmsgs, baud=6400, fsk_levels=4,
                                tail_bits=16)[0] for _ in range(6)]
    fpcm = np.concatenate(frames)
    f = FlexDecoder()
    t0 = time.perf_counter()
    fout = f.on_pcm(fpcm)  # streaming API -> native FSM
    out["flex"] = len(fpcm) / (time.perf_counter() - t0) / 1e6
    assert len(fout) == 24

    pkts = [ais_gen.make_position_report(366000000 + k) for k in range(600)]
    sig = ais_gen.generate(pkts)
    a = AisDemodulator()
    t0 = time.perf_counter()
    a.on_pcm(sig)
    out["ais"] = len(sig) / (time.perf_counter() - t0) / 1e6
    assert len(a.packets) == 600
    return out


def bench_costas_native() -> float:
    from tsl_sdr_tpu.ops import costas
    from tsl_sdr_tpu.runtime.native import costas_native

    rng = np.random.default_rng(3)
    n = 8_000_000
    t = np.arange(n)
    ph = 2 * np.pi * 0.001 * t
    iq = (np.stack([np.cos(ph), np.sin(ph)], -1) * 9000).astype(np.int16)
    params = costas.make_costas_params(0.0, alpha=0.05, beta=0.002,
                                       e_max_q14=8192)
    costas_native(iq[:100_000], params)  # warm
    t0 = time.perf_counter()
    costas_native(iq, params)
    return n / (time.perf_counter() - t0) / 1e6


def cpu_baseline(nr_channels, taps, decim) -> float:
    exe = REPO / "bench" / "cpu_baseline"
    src = REPO / "bench" / "cpu_baseline.c"
    if not exe.exists() or exe.stat().st_mtime < src.stat().st_mtime:
        subprocess.run(["gcc", "-O2", "-march=native", "-o", str(exe),
                        str(src), "-lm"], check=True)
    out = subprocess.run(
        [str(exe), str(nr_channels), str(taps), str(decim), "2000000"],
        check=True, capture_output=True, text=True,
    )
    return float(out.stdout.strip())


def main():
    import jax
    from tsl_sdr_tpu.utils import roofline

    platform = jax.devices()[0].platform
    rows = []

    r = bench_multifm(1)
    b = roofline.channelizer(1, 128, 40)
    rows.append(("multifm 1-channel NBFM (128 taps, decim 40)",
                 f"{r:,.0f} Msps/chip", b.describe(r)))
    r8 = bench_multifm(8)
    cpu8 = cpu_baseline(8, 128, 40)
    b = roofline.channelizer(8, 128, 40)
    rows.append(("multifm 8-channel channelizer (etc/multifm.json shape)",
                 f"{r8:,.0f} Msps/chip ({r8 / cpu8:,.0f}x the scalar C "
                 f"baseline at {cpu8:.1f} Msps)", b.describe(r8)))
    r64 = bench_multifm(64)
    b64 = roofline.channelizer(64, 128, 40)
    rows.append(("multifm 64-channel channelizer (8x the reference's "
                 "flagship width)",
                 f"{r64:,.0f} Msps/chip = {r64 * 64 / 1e3:,.1f} G "
                 "channel-samples/s", b64.describe(r64)))
    r = bench_exact_fir()
    b = roofline.channelizer(8, 128, 40)
    rows.append(("BIT-EXACT integer FIR bank (== C arithmetic, 8ch/128tap)",
                 f"{r:,.0f} Msps/chip on-device", b.describe(r)))
    r = bench_resampler()
    b = roofline.resampler(821, 16, 25)
    rows.append(("rational resampler 16/25 (821 taps)",
                 f"{r:,.0f} Msps/chip", b.describe(r)))
    p = bench_pocsag_chain()
    rows.append(("POCSAG chain: wideband 1.2288 Msps -> channelize+demod "
                 "(TPU) -> scan decode (host)",
                 f"{p['msps']:,.1f} Msps end-to-end, messages verified", "-"))
    p8 = bench_pipeline_8ch()
    rows.append(("pipeline: 8-channel POCSAG deployment, wideband -> "
                 "8 decoded channels in one call",
                 f"{p8['msps']:,.1f} Msps end-to-end, all 8 messages "
                 "verified", "-"))
    scans = bench_decoder_scans()
    rows.append(("decoder batch scans on sync-free PCM (host)",
                 f"POCSAG {scans['pocsag']:.1f} / FLEX {scans['flex']:.0f} / "
                 f"AIS {scans['ais']:.0f} Msps", "-"))
    dense = bench_decoder_dense()
    rows.append(("decoder 100%-duty burst traffic (host)",
                 f"POCSAG {dense['pocsag']:.1f} / FLEX {dense['flex']:.1f} / "
                 f"AIS {dense['ais']:.0f} Msps", "-"))
    r = bench_costas_native()
    rows.append(("Costas loop (native serial PLL, host)",
                 f"{r:,.0f} Msps", "-"))

    md = ["# Benchmark suite", "",
          f"Platform: {platform} ({jax.devices()[0]})", "",
          "| Config | Result | % of single-chip speed-of-light |",
          "|---|---|---|"]
    for name, result, sol in rows:
        md.append(f"| {name} | {result} | {sol} |")
    md.append("")
    md.append("Methodology: device numbers use the state-threaded "
              "differential harness (see bench.py); best of "
              f"{TRIALS} trials. Speed-of-light bounds are algorithmic "
              "(useful MACs at 98.5e12 MAC/s, minimal stream bytes at "
              "819 GB/s — tsl_sdr_tpu/utils/roofline.py); 100% would mean "
              "zero overhead and perfect overlap. The POCSAG end-to-end row "
              "includes pulling the decoded-rate PCM to the host across this "
              "box's <3 MB/s tunnel — on a real TPU host that transfer is "
              "PCIe-speed. Generated by bench_suite.py.")
    md.append("")
    md.append("64-channel scaling: at 64ch the chain attains "
              f"{b64.pct(r64):.1f}% of its "
              f"{b64.sol_msps/1e3:,.0f} Gsps bound. Neither resource "
              "saturates (MXU bound "
              f"{b64.mxu_msps/1e3:,.0f} Gsps, HBM bound "
              f"{b64.hbm_msps/1e3:,.0f} Gsps): measured FIR-only throughput "
              "is ~1.5x the full chain, so ~1/3 of the time is the FM "
              "discriminator section's f32 conversion/elementwise traffic "
              "and the rest is XLA pass overhead on the int16->int32->f32 "
              "pipeline, not a saturated unit. The Pallas backend closes "
              "part of the gap at this width (it avoids the int32 "
              "accumulator HBM round-trip); Mosaic cannot lower integer "
              "matmuls on this toolchain, which caps further fusion.")
    (REPO / "BENCH_SUITE.md").write_text("\n".join(md) + "\n")
    print("\n".join(md))
    print(json.dumps({n: r for n, r, _ in rows}), file=sys.stderr)


if __name__ == "__main__":
    main()
