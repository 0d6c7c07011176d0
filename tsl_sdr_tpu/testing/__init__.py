"""Synthetic signal generators for parity/golden testing.

The reference's test strategy is recorded-IQ replay fixtures (SURVEY §4.3);
its fixture files are not distributed. These generators synthesize the same
wire formats from first principles (POCSAG/FLEX batches, AIS HDLC frames,
NBFM channels) so decode tests are self-contained: encode a message ->
modulate -> run the decoder -> require the exact message back.
"""
