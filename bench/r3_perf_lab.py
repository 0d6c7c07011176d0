#!/usr/bin/env python3
"""Round-3 perf experiments (run on the real TPU):

  python bench/r3_perf_lab.py resampler   # polyphase variants + pallas
  python bench/r3_perf_lab.py chain       # pallas precision vs xla, 8/64ch
  python bench/r3_perf_lab.py pipeline    # fused streaming e2e

Uses the state-threaded differential harness for device rates (see
bench.py) and the persistent compile cache.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import numpy as np

TRIALS = 4


def _rate(step_fn, state0, blocks, samples_per_pass, bound_msps=None):
    """Median Msps over TRIALS calibrated differential trials
    (utils/benchtime.py: >=0.5 s windows, above-roofline rejection)."""
    import statistics

    import jax

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from tsl_sdr_tpu.utils.benchtime import make_calibrated_bench

    bench = make_calibrated_bench(
        step_fn, state0, blocks, samples_per_pass, bound_msps=bound_msps
    )
    rates = [r for r in (bench() for _ in range(TRIALS)) if r is not None]
    if not rates:
        return float("nan")
    return statistics.median(rates)


def resampler():
    import jax
    import jax.numpy as jnp
    from tsl_sdr_tpu.ops import polyphase, q14
    from tsl_sdr_tpu.ops.pallas_resampler import resample_capture_pallas
    from tsl_sdr_tpu.utils.filter_design import design_rational_resampler_filter

    coeffs = design_rational_resampler_filter(16, 25, 0.4)
    plan = polyphase.make_resampler_plan(
        q14.quantize_q14(coeffs), 16, 25, block_out_target=1 << 20
    )
    rng = np.random.default_rng(0)
    nb = 8
    x = rng.integers(-12000, 12000,
                     size=(plan.carry_len + nb * plan.block_in,),
                     dtype=np.int64).astype(np.int16)
    blocks = jax.device_put(
        jnp.asarray(x[plan.carry_len:].reshape(nb, plan.block_in)))
    st0 = polyphase.init_resampler_state(plan, prefix=x[: plan.carry_len])
    n = nb * plan.block_in

    from tsl_sdr_tpu.ops.polyphase import (
        _resample_fast_kernel, _resample_fast_kernel_t)

    wt = jnp.asarray(np.ascontiguousarray(
        plan.w_frames_i16.reshape(
            plan.frame_shifts, plan.d_rep, plan.i_rep).transpose(0, 2, 1)))
    wf = jnp.asarray(plan.w_frames)

    def step_t(st, blk):
        c, out = _resample_fast_kernel_t(
            st.carry, blk, wt, s_shifts=plan.frame_shifts,
            d_rep=plan.d_rep, i_rep=plan.i_rep, k_out=plan.block_out)
        return polyphase.ResamplerState(carry=c), out.astype(jnp.int32)

    def step_plain(st, blk):
        c, out = _resample_fast_kernel(
            st.carry, blk, wf, s_shifts=plan.frame_shifts,
            d_rep=plan.d_rep, i_rep=plan.i_rep, k_out=plan.block_out)
        return polyphase.ResamplerState(carry=c), out.astype(jnp.int32)

    print("transposed-residue tier:",
          round(_rate(step_t, st0, blocks, n), 0), "Msps", flush=True)
    print("plain frame tier:      ",
          round(_rate(step_plain, st0, blocks, n), 0), "Msps", flush=True)

    # packed-row tier (ops/polyphase._resample_row_kernel)
    if plan.k_row:
        from tsl_sdr_tpu.ops.polyphase import _resample_row_kernel

        w0 = jnp.asarray(plan.w_row_i16)
        w1 = (jnp.asarray(plan.w_spill_i16)
              if plan.w_spill_i16 is not None else None)

        def step_row(st, blk):
            c, out = _resample_row_kernel(
                st.carry, blk, w0, w1, row_in=plan.row_in,
                k_row=plan.k_row, exact=False)
            return polyphase.ResamplerState(carry=c), out.astype(jnp.int32)

        print("packed-row tier:       ",
              round(_rate(step_row, st0, blocks, n), 0), "Msps", flush=True)
    else:
        print("packed-row tier: unsupported for this ratio", flush=True)

    # awkward-ratio probe: does 15/16 (AIS group; k_row = 1920 > default
    # cap) win on a big packed row despite its ~8% tap density?
    coeffs2 = design_rational_resampler_filter(15, 16, 0.4)
    for cap in (1024, 2048):
        p2 = polyphase.make_resampler_plan(
            q14.quantize_q14(coeffs2), 15, 16,
            block_out_target=1 << 20, k_row_max=cap)
        tag = f"15/16 cap={cap} ({'row' if p2.k_row else 'residue'})"
        x2 = rng.integers(-12000, 12000,
                          size=(p2.carry_len + nb * p2.block_in,),
                          dtype=np.int64).astype(np.int16)
        blocks2 = jax.device_put(jnp.asarray(
            x2[p2.carry_len:].reshape(nb, p2.block_in)))
        st2 = polyphase.init_resampler_state(p2, prefix=x2[: p2.carry_len])

        def step2(st, blk, _p=p2):
            st, out = polyphase.resample_step(_p, st, blk, exact=False)
            return st, out.astype(jnp.int32)

        print(tag, round(_rate(step2, st2, blocks2, nb * p2.block_in), 0),
              "Msps", flush=True)

    # pallas whole-capture (non-streaming API) — wall-clock differential
    pcm = x[plan.carry_len:]
    for tm in (256, 512, 1024):
        try:
            out = resample_capture_pallas(plan, pcm, tile_frames=tm)
            jax.block_until_ready(out)
            best = float("inf")
            for _ in range(TRIALS):
                t0 = time.perf_counter()
                jax.block_until_ready(
                    resample_capture_pallas(plan, pcm, tile_frames=tm))
                best = min(best, time.perf_counter() - t0)
            print(f"pallas tm={tm}:          ",
                  round(len(pcm) / best / 1e6, 0), "Msps (wall)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"pallas tm={tm}: FAILED {e}", flush=True)


def chain():
    import jax
    import jax.numpy as jnp
    from tsl_sdr_tpu.models.channelizer import MultifmChain
    from tsl_sdr_tpu.ops.pallas_chain import PallasChain
    from tsl_sdr_tpu.utils.filter_design import firdes_low_pass

    fs, d, t = 1_000_000, 40, 128
    lpf = firdes_low_pass(1.0, fs, 12_500, 9_000)[:t]
    rng = np.random.default_rng(0)
    block = 16_711_680  # 52224 rows: divisible by every pallas tile (256/512/1024) so the zero-copy v2 path engages (a misaligned block silently measures the concat-copy path)
    for c in (8, 64):
        offsets = rng.integers(-fs // 3, fs // 3, size=c)
        iq = rng.integers(-8000, 8000, size=(block + 4096, 2),
                          dtype=np.int64).astype(np.int16)
        for label, factory in (
            ("xla", lambda: MultifmChain(lpf, offsets, fs, d, exact=False,
                                         backend="xla")),
            ("pallas-highest", lambda: MultifmChain(
                lpf, offsets, fs, d, exact=False, backend="pallas")),
        ):
            ch = factory()
            st0 = ch.init_state(prefix=iq[: ch.carry_len])
            blocks = jax.device_put(jnp.asarray(
                iq[ch.carry_len : ch.carry_len + block].reshape(1, 2 * block)))
            r = _rate(ch._step_raw, st0, blocks, block)
            print(f"{c}ch {label}: {r:,.0f} Msps", flush=True)
        # pallas 'high' precision via a direct PallasChain
        ch = MultifmChain(lpf, offsets, fs, d, exact=False, backend="pallas")
        pc = PallasChain(ch.packed_plan, ch._omega_reduced, precision="high")

        def step(carry, bv):
            return pc.step(carry, bv)

        st0 = pc.init_carry(iq[: pc.carry_len])
        blocks = jax.device_put(jnp.asarray(
            iq[pc.carry_len : pc.carry_len + block].reshape(1, 2 * block)))
        r = _rate(step, st0, blocks, block)
        print(f"{c}ch pallas-high: {r:,.0f} Msps", flush=True)


def chain_tiles():
    """Sweep PallasChain tile_rows x precision at 8 and 64 channels —
    the knob space for VERDICT #2 (make the fused kernel win at 8ch and
    reach >=10% of the 64ch HBM bound)."""
    import jax
    import jax.numpy as jnp
    from tsl_sdr_tpu.models.channelizer import MultifmChain
    from tsl_sdr_tpu.ops.pallas_chain import PallasChain
    from tsl_sdr_tpu.utils.filter_design import firdes_low_pass

    fs, d, t = 1_000_000, 40, 128
    lpf = firdes_low_pass(1.0, fs, 12_500, 9_000)[:t]
    rng = np.random.default_rng(0)
    block = 16_711_680  # 52224 rows: divisible by every pallas tile (256/512/1024) so the zero-copy v2 path engages (a misaligned block silently measures the concat-copy path)
    for c in (8, 64):
        offsets = rng.integers(-fs // 3, fs // 3, size=c)
        iq = rng.integers(-8000, 8000, size=(block + 4096, 2),
                          dtype=np.int64).astype(np.int16)
        ch = MultifmChain(lpf, offsets, fs, d, exact=False, backend="xla")
        for tr in (128, 256, 512, 1024):
            for prec in ("highest", "high"):
                try:
                    pc = PallasChain(ch.packed_plan, ch._omega_reduced,
                                     tile_rows=tr, precision=prec)
                    st0 = pc.init_carry(iq[: pc.carry_len])
                    blocks = jax.device_put(jnp.asarray(
                        iq[pc.carry_len : pc.carry_len + block]
                        .reshape(1, 2 * block)))
                    r = _rate(pc.step, st0, blocks, block)
                    print(f"{c}ch tr={tr} {prec}: {r:,.0f} Msps",
                          flush=True)
                except Exception as e:  # noqa: BLE001
                    print(f"{c}ch tr={tr} {prec}: FAILED "
                          f"{type(e).__name__}: {e}", flush=True)


def pipeline():
    import jax

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
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
    iq4 = np.concatenate([iq] * 4)

    # egress-volume sensitivity: the same pipeline on pure noise (all 8
    # channels idle -> bit rows stay on device, ~0.5 KB/block/channel
    # flag+tail egress). If gating works, this rate ~= the burst rate —
    # the e2e row must not scale with PCM egress volume (VERDICT r2 #1).
    noise4 = rng.integers(-90, 90, size=iq4.shape).astype(np.int16)
    for tag, cap in (("bursts", iq4), ("all-gated noise", noise4)):
        pipe = ReceivePipeline(
            firdes_low_pass(1.0, fs, 9_600, 7_000), center, fs, decim,
            [ChannelSpec(center + o, "pocsag") for o in offsets],
            exact=False, block_size=4_194_304, inflight_depth=4)
        pipe.process_capture(cap)
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            pipe.process_capture(cap)
            best = max(best, len(cap) / (time.perf_counter() - t0) / 1e6)
        print(f"egress sweep [{tag}]: {best:.1f} Msps "
              f"(fetched={pipe.stream_stats['fetched'].tolist()})",
              flush=True)

    for bs, depth in ((1_048_576, 2), (1_048_576, 8), (4_194_304, 2),
                      (4_194_304, 4), (4_194_304, 8), (8_388_608, 4)):
        pipe = ReceivePipeline(
            firdes_low_pass(1.0, fs, 9_600, 7_000), center, fs, decim,
            [ChannelSpec(center + o, "pocsag") for o in offsets],
            exact=False, block_size=bs, inflight_depth=depth)
        pipe.process_capture(iq4)
        best = 0.0
        for _ in range(4):
            t0 = time.perf_counter()
            res = pipe.process_capture(iq4)
            dt = time.perf_counter() - t0
            caps = sorted(set(m.capcode for msgs in res for m in msgs))
            assert caps == [100000 + k for k in range(8)], caps
            best = max(best, len(iq4) / dt / 1e6)
            print(f"bs={bs} depth={depth}: e2e {len(iq4) / dt / 1e6:.1f} "
                  "Msps", flush=True)
        print(f"bs={bs} depth={depth}: BEST {best:.1f} Msps", flush=True)


def exact():
    """Bit-exact tier e2e (VERDICT r2 weak #6): the pipelined exact
    streaming engine (async FIR plane fetches, inflight depth, one
    vmapped resampler scan per ratio group) vs its r2 shape of ~4 Msps
    (blocking fetch + one device round trip per channel per block)."""
    import jax

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from tsl_sdr_tpu.models.pipeline import ChannelSpec, ReceivePipeline
    from tsl_sdr_tpu.testing import pocsag_gen
    from tsl_sdr_tpu.utils.filter_design import firdes_low_pass

    decim = 32
    fs = 38400 * decim
    center = 929_500_000
    offsets = [-450_000, -320_000, -190_000, -60_000,
               60_000, 190_000, 320_000, 450_000]
    rng = np.random.default_rng(11)
    parts = None
    for k, off in enumerate(offsets):
        bb = pocsag_gen.generate(
            [pocsag_gen.PocsagBurst(capcode=200000 + k, function=1,
                                    kind="alpha", content=f"EX{k}")],
            baud=1200, tail_bits=256)
        dev = bb.astype(np.float64) / 16384.0 * 19200
        ph = np.cumsum(np.repeat(2 * np.pi * (off + dev) / fs, decim))
        sig = np.stack([np.cos(ph), np.sin(ph)], -1) * 4000
        if parts is None:
            parts = np.zeros((len(sig) + 2_000_000, 2))
        parts[200_000:200_000 + len(sig)] += sig
    iq = (parts + rng.normal(scale=80, size=parts.shape)).astype(np.int16)
    # TSL_LAB_TINY=1: CPU smoke mode (validates the harness, not a rate)
    tiny = os.environ.get("TSL_LAB_TINY", "").strip() in ("1", "true", "yes")
    iq2 = iq if tiny else np.concatenate([iq] * 2)
    bs = 1_048_576 if tiny else 4_194_304
    trials = 1 if tiny else 3

    for depth in ((2,) if tiny else (2, 4)):
        # ONE pipeline per depth: the jitted FIR fn and the vmapped group
        # scans cache per instance, and flush() resets the stream, so
        # reusing the warmed pipe keeps compiles/retraces out of the
        # timed trials (CLAUDE.md bench rule)
        pipe = ReceivePipeline(
            firdes_low_pass(1.0, fs, 9_600, 7_000), center, fs, decim,
            [ChannelSpec(center + o, "pocsag") for o in offsets],
            exact=True, block_size=bs, inflight_depth=depth)
        got = pipe.push(iq2)
        for c, part in enumerate(pipe.flush()):
            got[c].extend(part)
        caps = sorted(set(m.capcode for msgs in got for m in msgs))
        assert caps == [200000 + k for k in range(8)], caps
        best = 0.0
        for _ in range(trials):
            t0 = time.perf_counter()
            pipe.push(iq2)
            pipe.flush()
            best = max(best, len(iq2) / (time.perf_counter() - t0) / 1e6)
        print(f"exact e2e depth={depth}: BEST {best:.1f} Msps", flush=True)


def profile():
    """Capture an XLA profiler trace of the flagship 8ch chain step (and
    the 64ch grouped form) to /tmp/jaxtrace — kernel-level timing for the
    pallas-vs-xla iteration (view with tensorboard or xprof)."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from tsl_sdr_tpu.models.channelizer import MultifmChain
    from tsl_sdr_tpu.utils.filter_design import firdes_low_pass

    for nch, backend in ((8, "xla"), (8, "pallas"), (64, "xla")):
        decim = 32
        fs = 38400 * decim
        lpf = firdes_low_pass(1.0, fs, 9_600, 7_000)
        offs = [(k - nch // 2) * 100_000 + 50_000 for k in range(nch)]
        chain = MultifmChain(lpf, offs, fs, decim, exact=False,
                             backend=backend)
        n = 1_048_576
        rng = np.random.default_rng(0)
        blk = jnp.asarray(rng.integers(-8000, 8000, size=2 * n,
                                       dtype=np.int64).astype(np.int16))
        st = chain.init_state()
        step = jax.jit(chain._step_raw)
        st, out = step(st, blk)  # compile + warm
        jax.block_until_ready(out)
        tag = f"{nch}ch-{backend}"
        with jax.profiler.trace(f"/tmp/jaxtrace/{tag}"):
            for _ in range(8):
                st, out = step(st, blk)
            jax.block_until_ready(out)
        print(f"trace written: /tmp/jaxtrace/{tag}", flush=True)


def tunnel():
    """Re-measure the axon tunnel latency model (CLAUDE.md timing notes):
    RTT, h2d/d2h streaming bandwidth, dispatch cost, and whether
    copy_to_host_async overlaps an intervening device compute."""
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print("device:", dev)

    small = jax.device_put(np.zeros(8, np.int32))
    small.block_until_ready()
    for name, nbytes in (("64B", 64), ("1MB", 1 << 20), ("16MB", 16 << 20)):
        host = np.random.default_rng(0).integers(
            -100, 100, size=nbytes // 2, dtype=np.int64).astype(np.int16)
        # h2d: device_put + a tiny reduce fetched as scalar
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            a = jax.device_put(host)
            float(jnp.sum(a[:4].astype(jnp.int32)))
            best = min(best, time.perf_counter() - t0)
        print(f"h2d {name}: {best * 1e3:.1f} ms "
              f"({nbytes / best / 1e6:.1f} MB/s incl. RTT)", flush=True)
        # d2h: fetch the whole device array
        a = jax.device_put(host)
        a.block_until_ready()
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(a)
            best = min(best, time.perf_counter() - t0)
        print(f"d2h {name}: {best * 1e3:.1f} ms "
              f"({nbytes / best / 1e6:.1f} MB/s incl. RTT)", flush=True)

    # does copy_to_host_async overlap a subsequent dispatch? fetch latency
    # should drop to ~0 when the copy was started one compute earlier
    big = jax.device_put(np.zeros(4 << 20, np.int16))
    f = jax.jit(lambda x: (x * 2).sum())
    float(f(big))
    for started_early in (False, True):
        best = float("inf")
        for _ in range(5):
            r = jax.jit(lambda x: x + 1)(big)
            if started_early:
                r.copy_to_host_async()
                float(f(big))          # ~compute to hide the copy under
                time.sleep(0.06)       # > RTT
            t0 = time.perf_counter()
            np.asarray(r)
            best = min(best, time.perf_counter() - t0)
        print(f"fetch 8MB (async-started={started_early}): "
              f"{best * 1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        # the axon site hook re-forces JAX_PLATFORMS at import; honoring
        # an explicit cpu request needs the config set BEFORE device init
        import jax

        jax.config.update("jax_platforms", "cpu")
    {"resampler": resampler, "chain": chain, "chain-tiles": chain_tiles,
     "pipeline": pipeline, "tunnel": tunnel, "exact": exact,
     "profile": profile}[sys.argv[1]]()
