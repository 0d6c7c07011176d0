"""Structured diagnostics: the TSL logging surface, Python-shaped.

The reference logs through ``MESSAGE(subsystem, severity, CODE, fmt, ...)``
macros wrapped per component (``MFM_MSG``/``FIL_MSG``/``PAG_MSG``/...,
SURVEY §2.3, §5) plus a hexdump helper (``tsl/hexdump.h``). Here that maps
onto :mod:`logging` with the same shape: a subsystem-tagged logger emitting
``[SUBSYS] CODE: message`` lines, and :func:`hexdump` for packet debugging
(used e.g. when inspecting raw AIS frames).
"""

from __future__ import annotations

import logging

_SEVERITIES = {
    "FATAL": logging.CRITICAL,
    "ERROR": logging.ERROR,
    "WARNING": logging.WARNING,
    "INFO": logging.INFO,
    "DEBUG": logging.DEBUG,
}


def subsystem_logger(subsystem: str) -> logging.Logger:
    return logging.getLogger(f"tsl_sdr_tpu.{subsystem.lower()}")


def message(subsystem: str, severity: str, code: str, fmt: str, *args):
    """``MESSAGE(subsys, SEV_*, "CODE", fmt, ...)`` equivalent."""
    subsystem_logger(subsystem).log(
        _SEVERITIES.get(severity.upper(), logging.INFO),
        "[%s] %s: " + fmt, subsystem.upper(), code, *args,
    )


def _dump_stream(env_value: str):
    """``stderr``/``-`` -> stderr; anything else -> append to that path."""
    import sys

    if env_value in ("stderr", "-", "1", "true"):
        return sys.stderr, False
    return open(env_value, "a"), True


def dump_shifted_lpf(offset_hz: int, taps, q_re, q_im) -> None:
    """Per-channel shifted-LPF coefficient dump, gated on ``TSL_DUMP_LPF``.

    Runtime equivalent of the reference's compile-time ``_DUMP_LPF`` block
    (``multifm/demod.c:229-258``): emits the complex bandpass taps and
    their Q.14-quantized integer forms in the same MATLAB-ish layout,
    followed by the total tap power. Set ``TSL_DUMP_LPF=stderr`` (or a
    file path to append to)."""
    import os

    dst = os.environ.get("TSL_DUMP_LPF")
    if not dst:
        return
    import numpy as np

    f, close = _dump_stream(dst)
    try:
        f.write(f"lpf_shifted_{offset_hz} = [\n")
        power = 0
        dpower = 0.0
        for t, qr, qi in zip(np.asarray(taps), q_re, q_im):
            f.write(f"    complex({t.real:f}, {t.imag:f}), "
                    f"%% ({int(qr)}, {int(qi)})\n")
            power += int(np.sqrt(float(int(qr) ** 2 + int(qi) ** 2)))
            dpower += abs(t)
        f.write("];\n")
        f.write(f"%% Total power: {power} ({power:016x}) ({dpower:f})\n")
    finally:
        if close:
            f.close()


def dump_phase_filters(phases) -> None:
    """Polyphase phase-filter dump, gated on ``TSL_DUMP_FILTER_COEFFICIENTS``.

    Runtime equivalent of the reference's compile-time
    ``_DUMP_FILTER_COEFFICIENTS`` block (``filter/polyphase_fir.c:86-94``):
    one line per phase with its zero-padded integer coefficients."""
    import os

    dst = os.environ.get("TSL_DUMP_FILTER_COEFFICIENTS")
    if not dst:
        return
    f, close = _dump_stream(dst)
    try:
        for i, row in enumerate(phases):
            f.write(f"\nPhase {i:4d}: ")
            f.write(" ".join(f"{int(v):6d}" for v in row))
        f.write("\n")
    finally:
        if close:
            f.close()


def hexdump(data: bytes, width: int = 16) -> str:
    """Classic offset/hex/ASCII dump (``tsl/hexdump.h`` equivalent)."""
    data = bytes(data)
    lines = []
    for off in range(0, len(data), width):
        chunk = data[off : off + width]
        hx = " ".join(f"{b:02x}" for b in chunk).ljust(width * 3 - 1)
        asc = "".join(chr(b) if 0x20 <= b <= 0x7E else "." for b in chunk)
        lines.append(f"{off:08x}  {hx}  |{asc}|")
    return "\n".join(lines)
