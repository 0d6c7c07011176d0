"""design-filter-tpu: rational-resampler filter designer.

Replicates ``scripts/design_interpolation_filter.py`` (Kaiser beta=7 low-pass
at the interpolated rate) without the GNURadio dependency; emits the same
JSON document shape.

Usage: design-filter-tpu INTERPOLATION DECIMATION FRACTIONAL_BW
"""

from __future__ import annotations

import sys


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if argv and argv[0] in ("-V", "--version"):
        from tsl_sdr_tpu.cli import cli_version as _version

        print(f"design-filter-tpu {_version()}")
        return 0
    if len(argv) < 3:
        print(
            "Usage: design-filter-tpu [interpolation] [decimation] "
            "[fractional bandwidth]\n"
            "  Design a filter for use with a rational resampler",
            file=sys.stderr,
        )
        return 1
    from tsl_sdr_tpu.utils.filter_design import resampler_filter_json

    print(resampler_filter_json(int(argv[0]), int(argv[1]), float(argv[2])))
    return 0


if __name__ == "__main__":
    sys.exit(main())
