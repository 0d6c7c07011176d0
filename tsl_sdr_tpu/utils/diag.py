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
