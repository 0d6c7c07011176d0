"""Command-line tools mirroring the reference applications:

* ``multifm-tpu``   — N-channel channelizer + FM demod (multifm)
* ``resampler-tpu`` — standalone rational resampler
* ``decoder-tpu``   — FLEX / POCSAG / AIS protocol decoder
* ``design-filter-tpu`` — rational-resampler filter designer
"""


def cli_version() -> str:
    """Package version, with the git revision appended when running from a
    checkout (the reference stamps git-describe via CMake,
    CMakeLists.txt:37-47)."""
    from tsl_sdr_tpu import __version__

    try:
        import pathlib
        import subprocess

        root = pathlib.Path(__file__).resolve().parents[2]
        rev = subprocess.run(
            ["git", "-C", str(root), "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=2,
        ).stdout.strip()
        return f"{__version__}+g{rev}" if rev else __version__
    except Exception:  # noqa: BLE001
        return __version__
