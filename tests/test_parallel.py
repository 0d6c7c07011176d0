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
    c_len = chain.carry_len
    q = chain.block_quantum
    state = chain.init_state(prefix=iq[:c_len])
    _, pcm_single = chain.step(state, iq[c_len:][: (s - c_len) // q * q])
    pcm_single = np.asarray(pcm_single)

    mesh = make_mesh(time=time_shards, channels=ch_shards, devices=jax.devices()[:8])
    fn = make_sharded_multifm(chain.packed_plan, mesh)
    pcm_sharded = np.asarray(fn(iq))

    # both paths index outputs globally: output k = input samples [k*d, k*d+T)
    m0 = 2  # skip the FM-history cold-start edge
    m1 = pcm_single.shape[1] - 2
    a = pcm_single[:, m0:m1].astype(np.int32)
    b = pcm_sharded[:, m0:m1].astype(np.int32)
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
