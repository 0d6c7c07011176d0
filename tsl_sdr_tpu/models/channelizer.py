"""multifm: the flagship model — N-channel NBFM channelizer.

One wideband IQ stream in; per channel: complex-bandpass FIR + decimate +
derotate (ops.fir), then FM quadrature discriminator (ops.fm); 16-bit PCM
out. Mirrors the capability of the reference's receiver/demod-thread fan-out
(``multifm/receiver.c:78-98`` + ``multifm/demod.c:49-121``) — but where the
reference broadcasts each buffer to N worker threads, here all channels ride
one batched tensor contraction, and blocks stream through a ``lax.scan``.

Use :class:`MultifmChain` programmatically or build one from a reference
multifm JSON config via :meth:`MultifmChain.from_config`.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from tsl_sdr_tpu.ops import fir, fm
from tsl_sdr_tpu.utils.config import MultifmConfig


class MultifmState(NamedTuple):
    fir: fir.ChannelFirState
    fm: fm.FmDemodState


class MultifmChain:
    """Channelize + FM-demodulate a wideband IQ stream on TPU.

    Parameters
    ----------
    lpf_taps : baseband LPF (float, unity DC gain) shared by all channels
    offsets_hz : per-channel offsets from the capture center frequency
    sample_rate : wideband input sample rate (Hz)
    decimation : input->channel decimation factor
    gains : optional per-channel linear gains
    exact : bit-exact integer tier (True) or fast float tier (False)
    """

    def __init__(
        self,
        lpf_taps,
        offsets_hz,
        sample_rate: float,
        decimation: int,
        gains=None,
        *,
        exact: bool = True,
    ):
        self.plan = fir.make_channel_fir_plan(
            lpf_taps, offsets_hz, sample_rate, decimation, gains
        )
        self.exact = exact
        self.sample_rate = float(sample_rate)
        self.decimation = int(decimation)

    @classmethod
    def from_config(cls, config: MultifmConfig, *, exact: bool = True):
        return cls(
            config.lpf_taps,
            config.channel_offsets_hz,
            config.sample_rate_hz,
            config.decimation_factor,
            gains=config.channel_gains,
            exact=exact,
        )

    @property
    def nr_channels(self) -> int:
        return self.plan.nr_channels

    @property
    def channel_rate(self) -> float:
        return self.sample_rate / self.decimation

    # -- streaming API ------------------------------------------------------

    def init_state(self, prefix=None) -> MultifmState:
        return MultifmState(
            fir=fir.init_channel_fir_state(self.plan, prefix=prefix),
            fm=fm.init_fm_state(batch_shape=(self.nr_channels,)),
        )

    def step(self, state: MultifmState, block):
        """(state, block[N, 2] int16) -> (state, pcm[C, N//D] int16)."""
        fir_state, ch = fir.channel_fir_step(
            self.plan, state.fir, block, exact=self.exact
        )
        fm_state, pcm = fm.fm_demod_step(state.fm, ch)
        return MultifmState(fir=fir_state, fm=fm_state), pcm

    # -- whole-array API (bench / batch jobs) -------------------------------

    def process_array(self, iq, block_size: int = 65536):
        """Process a whole in-memory capture. Returns pcm [C, K_total] int16.

        The capture is blocked and run through a jitted ``lax.scan`` so the
        full stream executes on-device in one dispatch.
        """
        iq = np.asarray(iq, dtype=np.int16)
        block_size -= block_size % self.decimation
        c_len = self.plan.carry_len
        n_blocks = (iq.shape[0] - c_len) // block_size
        if n_blocks < 1:
            raise ValueError("capture shorter than one block")
        state = self.init_state(prefix=iq[:c_len])
        body = iq[c_len : c_len + n_blocks * block_size]
        blocks = jnp.asarray(body.reshape(n_blocks, block_size, 2))
        state, pcm = self.scan_fn(state, blocks)
        # pcm: [n_blocks, C, K] -> [C, n_blocks * K]
        pcm = np.asarray(pcm)
        return np.moveaxis(pcm, 1, 0).reshape(self.nr_channels, -1)

    @functools.cached_property
    def scan_fn(self):
        """Jitted (state, blocks[n, N, 2]) -> (state, pcm[n, C, K]) scan.

        The plan (taps, rotator increments) is baked in as compile-time
        constants; one compilation per block shape."""
        plan, exact = self.plan, self.exact

        @jax.jit
        def run(state, blocks):
            def body(st, block):
                fir_state, ch = fir.channel_fir_step(plan, st.fir, block, exact=exact)
                fm_state, pcm = fm.fm_demod_step(st.fm, ch)
                return MultifmState(fir=fir_state, fm=fm_state), pcm

            return jax.lax.scan(body, state, blocks)

        return run
