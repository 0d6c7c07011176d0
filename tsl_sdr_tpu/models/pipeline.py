"""End-to-end receive pipeline: channelize -> resample -> protocol decode.

The reference deploys this as one multifm process plus one resampler/decoder
process *per channel*, glued by operator-created named FIFOs
(SURVEY §3.4; ``etc/multifm.json`` + ``decoder/decoder.c``). Here the same
topology is one object: the TPU runs the wideband channelizer for all
channels in a single batched chain, each channel's PCM is rationally
resampled to its protocol's rate contract (POCSAG 38400 Hz, FLEX 16 kHz,
AIS 48 kHz — ``pager/pager_pocsag.c:105``, ``pager_flex_priv.h:345-348``,
``ais/ais_demod_priv.h:57-67``), and the bit-level state machines decode on
the host.

The resampler ratio is derived automatically from the channel rate and the
protocol rate; its anti-alias filter is designed with the same Kaiser recipe
as the reference's GNURadio script.
"""

from __future__ import annotations

from dataclasses import dataclass
from fractions import Fraction

import numpy as np

from tsl_sdr_tpu.models.channelizer import MultifmChain
from tsl_sdr_tpu.models.resampler import ResamplerChain
from tsl_sdr_tpu.utils.filter_design import design_rational_resampler_filter

PROTOCOL_RATES = {"pocsag": 38_400, "flex": 16_000, "ais": 48_000}


def _make_decoder(protocol: str, freq_hz: int):
    if protocol == "pocsag":
        from tsl_sdr_tpu.models.pocsag import PocsagDecoder

        return PocsagDecoder()
    if protocol == "flex":
        from tsl_sdr_tpu.models.flex import FlexDecoder

        return FlexDecoder(freq_hz=freq_hz)
    if protocol == "ais":
        from tsl_sdr_tpu.models.ais import AisDecoder

        return AisDecoder()
    raise ValueError(f"unknown protocol {protocol!r}")


@dataclass
class ChannelSpec:
    """One narrowband channel: where it sits and what it speaks."""

    center_freq_hz: int
    protocol: str  # pocsag | flex | ais | pcm (raw demodulated audio)
    invert: bool = False
    dc_block: bool = False       # decoder -b flag (decoder/decoder.c:648-656)
    dc_block_pole: float = 0.9999
    db_gain: float | None = None  # per-channel dBGain (receiver.c:218-221)


class ReceivePipeline:
    """Wideband IQ in, decoded protocol messages (or raw PCM) out.

    Parameters
    ----------
    lpf_taps : channel-select LPF for the channelizer (shared, real)
    center_freq_hz : capture center frequency
    sample_rate : wideband sample rate (Hz)
    decimation : channelizer decimation; channel rate = fs / decimation
    channels : list of :class:`ChannelSpec`
    exact : bit-exact integer tier (True) or production float tier
    max_ratio : largest allowed resampler interpolation/decimation term
    """

    def __init__(
        self,
        lpf_taps,
        center_freq_hz: int,
        sample_rate: float,
        decimation: int,
        channels,
        *,
        exact: bool = False,
        backend: str = "xla",
        max_ratio: int = 256,
    ):
        self.channels = list(channels)
        offsets = [c.center_freq_hz - center_freq_hz for c in self.channels]
        gains = [
            10.0 ** (c.db_gain / 10.0) if c.db_gain is not None else 1.0
            for c in self.channels
        ]
        self.chain = MultifmChain(
            lpf_taps, offsets, sample_rate, decimation, gains=gains,
            exact=exact, backend=backend,
        )
        ch_rate = self.chain.channel_rate

        self._resamplers = []
        self._decoders = []
        for spec in self.channels:
            if spec.protocol == "pcm":
                self._resamplers.append(None)
                self._decoders.append(None)
                continue
            target = PROTOCOL_RATES[spec.protocol]
            ratio = Fraction(target, int(round(ch_rate)))
            if ratio.numerator > max_ratio or ratio.denominator > max_ratio:
                raise ValueError(
                    f"channel rate {ch_rate:.0f} Hz -> {target} Hz needs "
                    f"{ratio.numerator}/{ratio.denominator}; pick a "
                    "decimation giving a simpler ratio"
                )
            if ratio == 1:
                self._resamplers.append(None)
            else:
                coeffs = design_rational_resampler_filter(
                    ratio.numerator, ratio.denominator, 0.4
                )
                self._resamplers.append(
                    ResamplerChain(
                        coeffs, ratio.numerator, ratio.denominator,
                        exact=exact,
                    )
                )
            self._decoders.append(
                _make_decoder(spec.protocol, spec.center_freq_hz)
            )

    # protocols whose decoders consume ONLY a sign predicate of the PCM, so
    # the device can slice + bit-pack before transfer (16x less egress than
    # int16). FLEX is excluded: 4FSK slicing needs trained amplitude
    # thresholds (pager_flex.c:149-171).
    _PACK_PREDICATE = {
        "pocsag": lambda a: a < 0,   # pager_pocsag.c:91 (and FLEX 2FSK's
                                     # >= 0 is its complement)
        "ais": lambda a: a > 0,      # ais_demod.c:126
    }

    def process_capture(self, iq, *, device_decode: bool = True):
        """Run a whole capture. Returns a list (one entry per channel) of
        decoded message lists, or the raw int16 PCM for ``pcm`` channels.

        With ``device_decode`` (default), the per-channel resampler and DC
        blocker run device-resident chained off the channelizer output, and
        sign-sliceable protocols (POCSAG, AIS) transfer bit-PACKED slices
        instead of int16 PCM — the decoders only ever look at the sign
        predicate, so the decode is unchanged while device->host egress
        drops 16x (VERDICT r1 item 3).
        """
        import jax.numpy as jnp

        if device_decode:
            pcm = self.chain.process_array_device(np.asarray(iq, np.int16))
        else:
            pcm = self.chain.process_array(np.asarray(iq, np.int16))

        # stage 1: per-channel device-side front-end (invert/resample/DC)
        audios = []
        for i, spec in enumerate(self.channels):
            audio = pcm[i]
            xp = jnp if device_decode else np
            if spec.invert:
                audio = xp.clip(
                    -(audio.astype(xp.int32)), -32768, 32767
                ).astype(xp.int16)
            rs = self._resamplers[i]
            if rs is not None:
                if device_decode:
                    audio = rs.process_array_device(audio)
                else:
                    audio = rs.process_array(audio)
            if spec.dc_block:
                from tsl_sdr_tpu.ops import dc_blocker as dcb

                st = dcb.init_dc_blocker_state()
                p = dcb.make_pole_coeff(spec.dc_block_pole)
                _, audio = dcb.dc_blocker_step_exact(st, audio, p)
                if not device_decode:
                    audio = np.asarray(audio)
            audios.append(audio)

        # stage 2: slice + bit-pack sign-sliceable channels in BATCHES
        # grouped by (predicate, length) — one device dispatch and ONE
        # device->host fetch per group instead of per channel (each fetch
        # pays tunnel latency on this box)
        host_bits: dict[int, np.ndarray] = {}
        if device_decode:
            groups: dict[tuple, list[int]] = {}
            for i, spec in enumerate(self.channels):
                if (self._decoders[i] is not None
                        and spec.protocol in self._PACK_PREDICATE):
                    key = (spec.protocol in ("ais",), audios[i].shape[0])
                    groups.setdefault(key, []).append(i)
            for (is_gt, n), idxs in groups.items():
                stack = jnp.stack([audios[i] for i in idxs])
                pred = (stack > 0) if is_gt else (stack < 0)
                # pad rows to byte multiples and pack FLAT (row boundaries
                # stay byte-aligned; one kernel shape for any group)
                n8 = -(-n // 8) * 8
                if n8 != n:
                    pred = jnp.pad(pred, ((0, 0), (0, n8 - n)))
                packed = np.asarray(
                    jnp.packbits(pred.astype(jnp.uint8).reshape(-1))
                ).reshape(len(idxs), n8 // 8)
                for row, i in enumerate(idxs):
                    bits = np.unpackbits(packed[row])[:n]
                    host_bits[i] = bits

        results = []
        for i, spec in enumerate(self.channels):
            audio = audios[i]
            dec = self._decoders[i]
            if i in host_bits:
                # reconstruct +/-1 PCM carrying the exact slice predicate
                bits = host_bits[i]
                if spec.protocol == "ais":
                    audio = np.where(bits, 1, -1).astype(np.int16)
                else:
                    audio = np.where(bits, -1, 1).astype(np.int16)
            elif device_decode:
                audio = np.asarray(audio)
            if dec is None:
                results.append(audio)
            elif hasattr(dec, "scan"):
                # vectorized SEARCH fast-forward; message-exact vs on_pcm
                results.append(dec.scan(audio))
            else:
                results.append(dec.on_pcm(audio))
        return results
