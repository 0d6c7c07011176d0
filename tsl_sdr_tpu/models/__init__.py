"""Signal-chain models: the framework's "model families".

* :mod:`channelizer` — multifm: wideband IQ -> N narrowband FM channels (PCM)
* :mod:`resampler`   — rational polyphase resampler (+ optional DC blocker)
* :mod:`bch`         — BCH(31,21,t=2) codec over GF(2^5)
* :mod:`pocsag`      — POCSAG pager decoder
* :mod:`flex`        — FLEX pager decoder
* :mod:`ais`         — AIS GMSK demodulator + AIVDM message decoder
"""
