"""Framework utilities: config, IQ file formats, filter design, counters."""
