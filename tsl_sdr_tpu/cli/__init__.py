"""Command-line tools mirroring the reference applications:

* ``multifm-tpu``   — N-channel channelizer + FM demod (multifm)
* ``resampler-tpu`` — standalone rational resampler
* ``decoder-tpu``   — FLEX / POCSAG / AIS protocol decoder
* ``design-filter-tpu`` — rational-resampler filter designer
"""
