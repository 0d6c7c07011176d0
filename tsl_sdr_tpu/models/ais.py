"""AIS receiver: GMSK/NRZI demodulator + AIVDM message decoder.

Replicates the reference pair (``ais/ais_demod.c``, ``ais/ais_decode.c``):

* 48 kHz PCM in, 9600 bps -> blind decimate-by-5. Preamble hunt: five
  phase-interleaved shift registers of NRZI-decoded bits
  (``bit = !(last ^ cur)``) matched against 0x5555557E (preamble + HDLC
  start flag) within 2 errors on >= 3 of 5 phases (ais_demod.c:114-157).
* RECEIVING: one NRZI bit per 5 samples, HDLC bit-unstuffing (a 0 after
  five 1s is dropped), bytes filled LSB-first; end on the 0x7E flag in the
  decoded shift register or 1280-bit overflow; CRC-16/X.25 over all but the
  last 2 bytes (ais_demod.c:160-213).
* Field decode: MSB-first bitfield extraction over the byte array; message
  types 1/2/3 (position report), 4 (base station report), 5 (static +
  voyage data); 6-bit ASCII strings; AIVDM ASCII-armored raw payload
  (ais_decode.c:23-290).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

DECIMATION = 5
PREAMBLE_PATTERN = 0x5555557E
END_FLAG = 0x7E
MAX_PACKET_BITS = 5 * 256

EPFD_NAMES = [
    "Undefined", "GPS", "GLONASS", "Combined GPS/GLONASS", "Loran-C",
    "Chayka", "Integrated Navigation System", "Surveyed", "Galileo",
    "Unknown 9", "Unknown 10", "Unknown 11", "Unknown 12", "Unknown 13",
    "Unknown 14", "Unknown 15",
]


def crc16_x25(data: bytes) -> int:
    """CRC-16/X.25 (poly 0x8408 reflected, init 0xFFFF, final complement) —
    matches ``ais_demod.c:18-36``."""
    crc = 0xFFFF
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = (crc >> 1) ^ 0x8408 if crc & 1 else crc >> 1
    return (~crc) & 0xFFFF


def get_bitfield(packet: bytes, offset: int, length: int) -> int:
    """MSB-first bitfield extraction (``ais_decode.c:23-47``)."""
    start = offset // 8
    end = (offset + length + 7) // 8
    acc = 0
    for i in range(start, end):
        acc = (acc << 8) | packet[i]
    acc >>= (end * 8) - (offset + length)
    return acc & ((1 << length) - 1)


def get_bitfield_signed(packet: bytes, offset: int, length: int) -> int:
    v = get_bitfield(packet, offset, length)
    if v & (1 << (length - 1)):
        v -= 1 << length
    return v


def get_string(packet: bytes, offset: int, nr_chars: int) -> str:
    out = []
    for i in range(nr_chars):
        v = get_bitfield(packet, offset + 6 * i, 6)
        out.append(chr(v if v > 0x1F else v + 0x40))
    return "".join(out)


def ascii_armor(packet: bytes) -> str:
    """AIVDM 6-bit ASCII armor of the raw payload (``ais_decode.c:217-259``)."""
    out = []
    offs = 0
    n = len(packet)
    while offs < n:
        accum = 0
        for j in range(offs, min(offs + 3, n)):
            accum = (accum << 8) | packet[j]
        offs += 3
        for j in range(4):
            v = (accum >> ((3 - j) * 6)) & 0x3F
            out.append(chr(v + 48 if v <= 39 else v - 40 + 96))
    return "".join(out)


@dataclass
class AisPositionReport:
    mmsi: int
    nav_stat: int
    rate_of_turn: int
    speed_over_ground: float
    position_acc: int
    longitude: float
    latitude: float
    course: int
    heading: int
    timestamp: int
    msg_id: int = 1
    repeat: int = 0
    raw: str = ""


@dataclass
class AisBaseStationReport:
    mmsi: int
    year: int
    month: int
    day: int
    hour: int
    minute: int
    second: int
    longitude: float
    latitude: float
    epfd_type: int
    epfd_name: str = ""
    raw: str = ""


@dataclass
class AisStaticVoyageData:
    mmsi: int
    version: int
    imo_number: int
    callsign: str
    ship_name: str
    ship_type: int
    dim_to_bow: int
    dim_to_stern: int
    dim_to_port: int
    dim_to_starboard: int
    fix_type: int
    eta_month: int
    eta_day: int
    eta_hour: int
    eta_minute: int
    draught: float
    destination: str
    epfd_name: str = ""
    raw: str = ""


@dataclass
class AisClassBPositionReport:
    """Type 18 (Class B equipment position report) — a beyond-reference
    extension (the reference decodes only types 1-5); field layout per
    ITU-R M.1371-5 table 46, same unit conventions as the type 1/2/3
    decoder above."""

    mmsi: int
    speed_over_ground: float
    position_acc: int
    longitude: float
    latitude: float
    course: int
    heading: int
    timestamp: int
    repeat: int = 0
    raw: str = ""


@dataclass
class AisStaticDataReport:
    """Type 24 (Class B static data report, part A or B) — beyond-reference
    extension; layout per ITU-R M.1371-5 table 57/58."""

    mmsi: int
    part: str                 # "A" | "B"
    ship_name: str = ""       # part A
    ship_type: int = 0        # part B
    vendor_id: str = ""       # part B
    callsign: str = ""        # part B
    dim_to_bow: int = 0
    dim_to_stern: int = 0
    dim_to_port: int = 0
    dim_to_starboard: int = 0
    repeat: int = 0
    raw: str = ""


def decode_fields(packet: bytes):
    """Packet bytes (CRC stripped) -> typed report, or None for other types."""
    msg_id = (packet[0] >> 2) & 0x3F
    repeat = packet[0] & 0x3
    mmsi = (
        (packet[1] << 22)
        | (packet[2] << 14)
        | (packet[3] << 6)
        | ((packet[4] >> 2) & 0x3F)
    )
    raw = ascii_armor(packet)
    if msg_id in (1, 2, 3):
        return AisPositionReport(
            mmsi=mmsi,
            nav_stat=get_bitfield(packet, 38, 4),
            rate_of_turn=get_bitfield_signed(packet, 42, 8),
            speed_over_ground=get_bitfield(packet, 50, 10) / 10.0,
            position_acc=get_bitfield(packet, 60, 1),
            longitude=get_bitfield_signed(packet, 61, 28) / 600000.0,
            latitude=get_bitfield_signed(packet, 89, 27) / 600000.0,
            course=get_bitfield(packet, 116, 12),
            heading=get_bitfield(packet, 128, 9),
            timestamp=get_bitfield(packet, 137, 6),
            msg_id=msg_id,
            repeat=repeat,
            raw=raw,
        )
    if msg_id == 18:
        return AisClassBPositionReport(
            mmsi=mmsi,
            speed_over_ground=get_bitfield(packet, 46, 10) / 10.0,
            position_acc=get_bitfield(packet, 56, 1),
            longitude=get_bitfield_signed(packet, 57, 28) / 600000.0,
            latitude=get_bitfield_signed(packet, 85, 27) / 600000.0,
            course=get_bitfield(packet, 112, 12),
            heading=get_bitfield(packet, 124, 9),
            timestamp=get_bitfield(packet, 133, 6),
            repeat=repeat,
            raw=raw,
        )
    if msg_id == 4:
        epfd = get_bitfield(packet, 134, 4)
        return AisBaseStationReport(
            mmsi=mmsi,
            year=get_bitfield(packet, 38, 14),
            month=get_bitfield(packet, 52, 4),
            day=get_bitfield(packet, 56, 5),
            hour=get_bitfield(packet, 61, 5),
            minute=get_bitfield(packet, 66, 6),
            second=get_bitfield(packet, 72, 6),
            longitude=get_bitfield_signed(packet, 79, 28) / 600000.0,
            latitude=get_bitfield_signed(packet, 107, 27) / 600000.0,
            epfd_type=epfd,
            epfd_name=EPFD_NAMES[epfd & 0xF],
            raw=raw,
        )
    if msg_id == 24:
        part = get_bitfield(packet, 38, 2)
        if part == 0:
            return AisStaticDataReport(
                mmsi=mmsi, part="A",
                ship_name=get_string(packet, 40, 20),
                repeat=repeat, raw=raw,
            )
        return AisStaticDataReport(
            mmsi=mmsi, part="B",
            ship_type=get_bitfield(packet, 40, 8),
            vendor_id=get_string(packet, 48, 7),
            callsign=get_string(packet, 90, 7),
            dim_to_bow=get_bitfield(packet, 132, 9),
            dim_to_stern=get_bitfield(packet, 141, 9),
            dim_to_port=get_bitfield(packet, 150, 6),
            dim_to_starboard=get_bitfield(packet, 156, 6),
            repeat=repeat, raw=raw,
        )
    if msg_id == 5:
        fix = get_bitfield(packet, 270, 4)
        return AisStaticVoyageData(
            mmsi=mmsi,
            version=get_bitfield(packet, 38, 2),
            imo_number=get_bitfield(packet, 40, 30),
            callsign=get_string(packet, 70, 7),
            ship_name=get_string(packet, 112, 20),
            ship_type=get_bitfield(packet, 232, 8),
            dim_to_bow=get_bitfield(packet, 240, 9),
            dim_to_stern=get_bitfield(packet, 249, 9),
            dim_to_port=get_bitfield(packet, 258, 6),
            dim_to_starboard=get_bitfield(packet, 264, 6),
            fix_type=fix,
            eta_month=get_bitfield(packet, 274, 4),
            eta_day=get_bitfield(packet, 278, 5),
            eta_hour=get_bitfield(packet, 283, 5),
            eta_minute=get_bitfield(packet, 288, 6),
            draught=get_bitfield(packet, 294, 8) / 10.0,
            destination=get_string(packet, 302, 20),
            epfd_name=EPFD_NAMES[fix & 0xF],
            raw=raw,
        )
    return None


class AisDemodulator:
    """Raw HDLC packet receiver; feed 48 kHz int16 PCM via :meth:`on_pcm`.

    Emits (packet_bytes, fcs_valid) tuples; the reference only delivers
    CRC-valid packets to the callback — invalid ones bump a counter
    (``ais_demod.c:198-205``), mirrored by :attr:`crc_rejects`.
    """

    _SEARCH, _RECEIVING = 0, 1

    def __init__(self):
        self.state = self._SEARCH
        self.preambles = [0] * DECIMATION
        self.prior_sample = [0] * DECIMATION
        self.next_field = 0
        self.sample_skip = 0
        self.crc_rejects = 0
        self._rx_reset()
        self.packets: list[bytes] = []
        # scan() streaming carry (see PocsagDecoder)
        self._scan_tail = np.zeros(0, np.int16)
        self._scan_prefed = 0
        self._scan_want = 0
        self._scan_ever = False
        self._in_scan = False

    def _rx_reset(self):
        self.packet = bytearray(MAX_PACKET_BITS // 8 * 5)
        self.raw_shr = 0
        self.current_bit = 0
        self.nr_ones = 0
        self.last_sample = 0

    def _detect_reset(self):
        self.preambles = [0] * DECIMATION
        self.prior_sample = [0] * DECIMATION
        self.next_field = 0

    def _detect_sample(self, sample: int):
        s = 1 if sample > 0 else 0
        nf = self.next_field
        last = self.prior_sample[nf]
        self.prior_sample[nf] = s
        self.preambles[nf] = (
            (self.preambles[nf] << 1) | (0 if (last ^ s) else 1)
        ) & 0xFFFFFFFF
        nr_match = sum(
            1
            for p in self.preambles
            if bin(p ^ PREAMBLE_PATTERN).count("1") <= 2
        )
        if nr_match >= 3:
            self.state = self._RECEIVING
            self.sample_skip = 2
            self._rx_reset()
            self.last_sample = self.prior_sample[nf]
        self.next_field = (nf + 1) % DECIMATION

    def _rx_sample(self, sample: int):
        raw = 1 if sample > 0 else 0
        bit = 0 if (self.last_sample ^ raw) else 1
        self.raw_shr = ((self.raw_shr << 1) | bit) & 0xFF
        self.last_sample = raw
        if self.nr_ones < 5:
            self.packet[self.current_bit // 8] |= bit << (self.current_bit % 8)
            self.current_bit += 1
        self.nr_ones = 0 if bit == 0 else self.nr_ones + 1

        if self.raw_shr == END_FLAG or self.current_bit == MAX_PACKET_BITS:
            nbytes = self.current_bit // 8
            if nbytes >= 4:
                body = bytes(self.packet[: nbytes - 2])
                rx_crc = self.packet[nbytes - 2] | (self.packet[nbytes - 1] << 8)
                if crc16_x25(body) == rx_crc:
                    self.packets.append(body)
                else:
                    self.crc_rejects += 1
            self.state = self._SEARCH
            self.sample_skip = 0
            self._detect_reset()

    def scan(self, pcm) -> list[bytes]:
        """Batch decode with a vectorized preamble fast-forward.

        Packet-exact vs :meth:`on_pcm`: the preamble trigger needs >=3 of 5
        phase registers within hamming 2 of 0x5555557E; a numpy prefilter
        marks every sample whose freshly-updated register is within hamming
        2 (a strict superset). The unmodified FSM runs only from 40*5
        samples before each candidate (registers and NRZI history refill).

        Streaming-safe: the last ``lookback`` samples are always carried as
        prefilter context with the FSM-fed prefix tracked (see
        PocsagDecoder.scan). Do not interleave scan() and on_pcm() on the
        same instance.
        """
        pcm = np.asarray(pcm, dtype=np.int16)
        start_msg = len(self.packets)
        self._scan_ever = True
        self._in_scan = True
        tail = self._scan_tail
        prefed = self._scan_prefed
        feed_until = prefed + self._scan_want
        if tail.size:
            pcm = np.concatenate([tail, pcm])
        self._scan_tail = np.zeros(0, np.int16)
        self._scan_prefed = 0
        self._scan_want = 0
        n = pcm.shape[0]

        s = (pcm > 0).astype(np.uint32)
        nrzi = np.zeros(n, dtype=np.uint32)
        nrzi[DECIMATION:] = 1 - (s[DECIMATION:] ^ s[:-DECIMATION])
        pad = 31 * DECIMATION
        bp = np.concatenate([np.zeros(pad, np.uint32), nrzi])
        # the trigger needs >=3 of 5 phase registers matching; their update
        # instants are 3 distinct samples within a 5-sample window. A
        # stride-2 grid covers 3 of any 5 consecutive positions, so at least
        # one match instant always lands on a probe (stride 3 could miss:
        # matches at {1,2,4} avoid grid {0,3}). Superset preserved, half the
        # work.
        stride = 2
        pos = np.arange(0, n, stride)
        w = np.zeros(pos.shape[0], dtype=np.uint32)
        for k in range(32):
            s0 = pad - k * DECIMATION
            w |= bp[s0 : s0 + n : stride] << np.uint32(k)
        v = w ^ np.uint32(PREAMBLE_PATTERN)
        v = v - ((v >> 1) & np.uint32(0x55555555))
        v = (v & np.uint32(0x33333333)) + ((v >> 2) & np.uint32(0x33333333))
        v = (v + (v >> 4)) & np.uint32(0x0F0F0F0F)
        pc = (v * np.uint32(0x01010101)) >> np.uint32(24)
        cand_idx = pos[pc <= 2]

        lookback = 40 * DECIMATION
        chunk = 1280 * DECIMATION + 512  # max packet + margin

        i = prefed
        ci = 0
        fed_end = prefed
        want_end = feed_until
        while i < n:
            if self.state != self._SEARCH:
                self.on_pcm(pcm[i : i + chunk])
                i += chunk
                fed_end = min(i, n)
                continue
            if i < feed_until:
                # finish the contiguous margin owed from the previous block
                end = min(n, feed_until)
                self.on_pcm(pcm[i:end])
                i = end
                fed_end = end
                continue
            while ci < len(cand_idx) and cand_idx[ci] < i:
                ci += 1
            if ci >= len(cand_idx):
                break
            c = int(cand_idx[ci])
            start = max(i, c - lookback)
            if start > i:
                self._detect_reset()  # zero registers cannot match
                i = start
            end = min(n, c + 8 * DECIMATION)
            self.on_pcm(pcm[i:end])
            i = end
            fed_end = end
            want_end = max(want_end, c + 8 * DECIMATION)
        if self.state == self._SEARCH:
            keep_start = max(0, n - lookback)
            if fed_end < keep_start:
                self._detect_reset()
            else:
                self._scan_prefed = fed_end - keep_start
                self._scan_want = max(0, want_end - n)
            self._scan_tail = pcm[keep_start:].copy()
        self._in_scan = False
        return self.packets[start_msg:]

    def on_pcm(self, pcm) -> list[bytes]:
        if self._scan_ever and not self._in_scan:
            raise RuntimeError(
                "do not interleave on_pcm() with scan() on the same "
                "decoder instance (scan carries prefilter state)")
        pcm = np.asarray(pcm, dtype=np.int16)
        start = len(self.packets)
        i = 0
        n = pcm.shape[0]
        while i < n:
            if self.state == self._SEARCH:
                while i < n:
                    self._detect_sample(int(pcm[i]))
                    i += 1
                    if self.state == self._RECEIVING:
                        break
            else:
                while i < n:
                    skip = self.sample_skip
                    self.sample_skip += 1
                    if skip % DECIMATION == 0:
                        self._rx_sample(int(pcm[i]))
                        if self.state == self._SEARCH:
                            i += 1
                            break
                    i += 1
        return self.packets[start:]


class AisDecoder:
    """Full AIS receive chain: demod + field decode (48 kHz PCM in)."""

    def __init__(self):
        self.demod = AisDemodulator()
        self.messages = []

    @property
    def crc_rejects(self) -> int:
        return self.demod.crc_rejects

    def on_pcm(self, pcm):
        start = len(self.messages)
        for packet in self.demod.on_pcm(pcm):
            msg = decode_fields(packet)
            if msg is not None:
                self.messages.append(msg)
        return self.messages[start:]

    def scan(self, pcm):
        """Batch decode via the demodulator's vectorized preamble scan."""
        start = len(self.messages)
        for packet in self.demod.scan(pcm):
            msg = decode_fields(packet)
            if msg is not None:
                self.messages.append(msg)
        return self.messages[start:]
