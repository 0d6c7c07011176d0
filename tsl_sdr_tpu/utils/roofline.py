"""Single-chip speed-of-light bounds for the benchmark configs.

Makes the bench numbers interpretable (VERDICT r1 item 4): every
BENCH_SUITE row gets the Msps bound implied by the chip's MXU MAC rate and
HBM bandwidth for that algorithm, and the % of that bound attained.

Chip model (TPU v5e / "v5 lite", public figures):

* MXU: 197 TFLOP/s bf16 -> 98.5e12 MAC/s. The int16 x int16 -> int32 path
  issues through the same MXU passes as bf16 on this generation, so the
  same MAC rate is used for the integer tiers.
* HBM: 819 GB/s.

The bounds are ALGORITHMIC lower bounds (useful MACs, minimal bytes:
stream in once, stream results out once). Real kernels move intermediates
too, so "% of SoL" is a conservative utilization number: 100% would mean
zero overhead AND perfect overlap.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

MXU_MACS_PER_S = 98.5e12
HBM_BYTES_PER_S = 819e9


@dataclass
class Bound:
    sol_msps: float        # min(mxu, hbm)
    mxu_msps: float
    hbm_msps: float

    @property
    def limiter(self) -> str:
        return "MXU" if self.mxu_msps <= self.hbm_msps else "HBM"

    def pct(self, measured_msps: float) -> float:
        return 100.0 * measured_msps / self.sol_msps

    def describe(self, measured_msps: float) -> str:
        return (f"{self.pct(measured_msps):.1f}% of the "
                f"{self.sol_msps / 1e3:,.0f} Gsps single-chip "
                f"speed-of-light ({self.limiter}-bound)")


def channelizer(nr_channels: int, taps: int, decim: int) -> Bound:
    """N-channel complex-bandpass FIR + decimate + derotate + FM demod.

    Useful MACs per input sample: each channel computes one T-tap complex
    MAC (4T real MACs) per D input samples. Minimal HBM bytes per input
    sample: 4 (IQ int16 in) + 2*C/D (PCM int16 out).
    """
    macs = nr_channels * 4.0 * taps / decim
    bytes_per = 4.0 + 2.0 * nr_channels / decim
    return Bound(
        sol_msps=min(MXU_MACS_PER_S / macs, HBM_BYTES_PER_S / bytes_per) / 1e6,
        mxu_msps=MXU_MACS_PER_S / macs / 1e6,
        hbm_msps=HBM_BYTES_PER_S / bytes_per / 1e6,
    )


def resampler(taps: int, interp: int, decim: int) -> Bound:
    """Rational I/D polyphase resampler on real int16 PCM.

    Per input sample: I/D outputs, each a ceil(T/I)-tap real MAC.
    Minimal bytes: 2 in + 2*I/D out.
    """
    phase_len = math.ceil(taps / interp)
    macs = (interp / decim) * phase_len
    bytes_per = 2.0 + 2.0 * interp / decim
    return Bound(
        sol_msps=min(MXU_MACS_PER_S / macs, HBM_BYTES_PER_S / bytes_per) / 1e6,
        mxu_msps=MXU_MACS_PER_S / macs / 1e6,
        hbm_msps=HBM_BYTES_PER_S / bytes_per / 1e6,
    )
