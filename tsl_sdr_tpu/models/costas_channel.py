"""Coherent (Costas-loop) channelizer: PSK-style channels to rotated IQ.

The reference builds a Costas demodulator but never wires it to a config
path — its demod thread instantiates only FM (``multifm/demod.c:318``,
``multifm/costas_demod.c``). This framework exposes it as a first-class
chain: wideband IQ -> lane-packed channel FIR bank -> integer-NCO
derotation -> per-channel 2nd-order Costas loop (a true serial recurrence,
run as a ``lax.scan`` vmapped across channels).

Output is phase-locked IQ per channel (int16, Q.14-scaled like the
reference's ``multifm_costas_demod_process`` output).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from tsl_sdr_tpu.ops import costas, packed_fir


class CostasChainState(NamedTuple):
    carry_vals: jnp.ndarray   # packed FIR history
    out_index: jnp.ndarray    # [] int32 absolute output index (NCO)
    costas: costas.CostasState  # leaves vmapped over channels [C]


class CostasChannelizer:
    """Channelize + coherently demodulate N PSK channels.

    Same front-end contract as :class:`MultifmChain` (fast tier); the
    back-end replaces the FM discriminator with per-channel Costas loops.
    """

    def __init__(
        self,
        lpf_taps,
        offsets_hz,
        sample_rate: float,
        decimation: int,
        gains=None,
        *,
        alpha: float = 0.05,
        beta: float = 0.002,
        e_max_q14: int = 8192,
        f_shift: float = 0.0,
    ):
        self.packed_plan = packed_fir.make_packed_fir_plan(
            lpf_taps, offsets_hz, sample_rate, decimation, gains
        )
        self.params = costas.make_costas_params(
            f_shift, alpha=alpha, beta=beta, e_max_q14=e_max_q14
        )
        self.sample_rate = float(sample_rate)
        self.decimation = int(decimation)
        self._oi32 = jnp.asarray(
            packed_fir.omega_turns_i32(self.packed_plan.omega_d)
        )

    @property
    def nr_channels(self) -> int:
        return self.packed_plan.nr_channels

    @property
    def carry_len(self) -> int:
        return self.packed_plan.carry_len

    @property
    def block_quantum(self) -> int:
        return self.packed_plan.block_quantum

    def init_state(self, prefix=None) -> CostasChainState:
        c = self.nr_channels
        single = costas.init_costas_state(self.params)
        per_ch = jax.tree.map(
            lambda v: jnp.broadcast_to(v, (c,)), single
        )
        return CostasChainState(
            carry_vals=packed_fir.init_packed_carry(self.packed_plan, prefix),
            out_index=jnp.zeros((), jnp.int32),
            costas=per_ch,
        )

    def step(self, state: CostasChainState, block):
        """(state, block[N,2] int16) -> (state, iq [C, N//D, 2] int16)."""
        if isinstance(block, np.ndarray):
            block = block.reshape(-1)
        carry, ar, ai = packed_fir.packed_fir_step(
            self.packed_plan, state.carry_vals, block
        )
        c = self.nr_channels
        yr, yi = packed_fir.nco_rotate(
            ar.reshape(-1, c), ai.reshape(-1, c), self._oi32, state.out_index
        )
        # packed accumulators carry the Q.14 tap scale; the Costas loop's
        # quadratic error term expects sample-unit amplitudes
        scale = jnp.float32(1.0 / 16384.0)
        yr = yr * scale
        yi = yi * scale
        # per-channel serial PLL: vmap the scan over the channel axis
        blocks_c = jnp.stack([yr.T, yi.T], axis=-1)  # [C, K, 2] float
        st2, out = jax.vmap(
            lambda s, b: costas.costas_step(self.params, s, b)
        )(state.costas, blocks_c)
        k = yr.shape[0]
        new_state = CostasChainState(
            carry_vals=carry,
            out_index=state.out_index + jnp.int32(k),
            costas=st2,
        )
        return new_state, out
