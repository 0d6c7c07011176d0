import numpy as np
import jax
import pytest

from tsl_sdr_tpu.models.channelizer import MultifmChain
from tsl_sdr_tpu.parallel.mesh import make_mesh
from tsl_sdr_tpu.parallel.channelizer import make_sharded_multifm
from tsl_sdr_tpu.utils.filter_design import firdes_low_pass

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_sharded_matches_single_device():
    fs, d = 128_000, 4
    lpf = firdes_low_pass(1.0, fs, 12_000, 8_000)[:33]
    offsets = [8_000, -24_000]
    chain = MultifmChain(lpf, offsets, fs, d, exact=False)

    rng = np.random.default_rng(60)
    time_shards, ch_shards = 4, 2
    seg = 512 * d
    s = seg * time_shards
    iq = rng.integers(-12000, 12000, size=(s, 2), dtype=np.int64).astype(np.int16)

    # single-device reference: primed chain over the same stream
    state = chain.init_state(prefix=iq[: chain.plan.carry_len])
    _, pcm_single = chain.step(state, iq[chain.plan.carry_len :][: (s - chain.plan.carry_len) // d * d])
    pcm_single = np.asarray(pcm_single)

    mesh = make_mesh(time=time_shards, channels=ch_shards, devices=jax.devices()[:8])
    fn = make_sharded_multifm(chain.plan, mesh)
    pcm_sharded = np.asarray(fn(iq))

    # alignment: sharded position p == global output m at p = m + carry_len/d
    halo_d = chain.plan.carry_len // d
    m0 = halo_d + 2  # skip warmup + FM-history edge
    m1 = pcm_single.shape[1] - halo_d - 2
    a = pcm_single[:, m0:m1].astype(np.int32)
    b = pcm_sharded[:, m0 + halo_d : m1 + halo_d].astype(np.int32)
    diff = np.abs(a - b)
    assert (diff <= 1).mean() > 0.999, (diff.max(), (diff > 1).mean())
    assert (diff == 0).mean() > 0.98


def test_dryrun_multichip():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out_state, pcm = jax.jit(fn)(*args)
    assert np.asarray(pcm).shape[0] == 4  # n_blocks
