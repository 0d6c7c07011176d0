import numpy as np
import pytest

from tsl_sdr_tpu.models.ais import (
    AisDecoder,
    AisDemodulator,
    crc16_x25,
    get_bitfield,
    ascii_armor,
)
from tsl_sdr_tpu.testing import ais_gen as gen

POS = gen.make_position_report(
    367001234, nav_stat=5, rate_of_turn=-12, speed_over_ground=14.2,
    longitude=-122.4194, latitude=37.7749, course=2718, heading=272,
    timestamp=42,
)
BASE = gen.make_base_station_report(
    3669999, year=2026, month=8, day=16, hour=9, minute=15, second=30,
    longitude=4.47917, latitude=51.9225, epfd_type=1,
)
VOYAGE = gen.make_static_voyage(
    366123456, imo=9074729, callsign="WDA1234", ship_name="EVER GIVEN",
    ship_type=70, dims=(100, 300, 20, 30), draught=12.5,
    destination="ROTTERDAM",
)


def test_crc16_x25_known_vector():
    # CRC-16/X.25 check value for "123456789" is 0x906E
    assert crc16_x25(b"123456789") == 0x906E


def test_bitfield_roundtrip():
    p = bytearray(21)
    gen.set_bitfield(p, 13, 11, 0x5A5)
    assert get_bitfield(bytes(p), 13, 11) == 0x5A5
    gen.set_bitfield(p, 61, 28, 0xABCDEF1)
    assert get_bitfield(bytes(p), 61, 28) == 0xABCDEF1


def test_position_report_roundtrip():
    dec = AisDecoder()
    msgs = dec.on_pcm(gen.generate([POS]))
    assert len(msgs) == 1 and dec.crc_rejects == 0
    m = msgs[0]
    assert m.mmsi == 367001234
    assert m.nav_stat == 5
    assert m.rate_of_turn == -12
    assert abs(m.speed_over_ground - 14.2) < 0.05
    assert abs(m.longitude - (-122.4194)) < 1e-5
    assert abs(m.latitude - 37.7749) < 1e-5
    assert m.course == 2718 and m.heading == 272 and m.timestamp == 42
    assert m.raw == ascii_armor(POS)


def test_base_and_voyage_roundtrip():
    msgs = AisDecoder().on_pcm(gen.generate([BASE, VOYAGE]))
    assert len(msgs) == 2
    b, v = msgs
    assert (b.year, b.month, b.day, b.hour, b.minute, b.second) == (
        2026, 8, 16, 9, 15, 30,
    )
    assert b.epfd_name == "GPS"
    assert v.imo_number == 9074729
    assert v.callsign == "WDA1234"
    assert v.ship_name.startswith("EVER GIVEN")
    assert v.destination.startswith("ROTTERDAM")
    assert abs(v.draught - 12.5) < 0.05


def test_preamble_tolerates_two_bit_errors():
    pcm = gen.generate([POS]).copy()
    # corrupt one preamble bit cell (after the 48-bit lead-in): an NRZI level
    # flip corrupts exactly two decoded bits — the detector's full tolerance
    s = 52 * 5
    pcm[s : s + 5] = -pcm[s : s + 5].astype(np.int32)
    msgs = AisDecoder().on_pcm(pcm)
    assert len(msgs) == 1 and msgs[0].mmsi == 367001234


def test_corrupt_body_rejected_by_crc():
    pcm = gen.generate([POS]).copy()
    # flip one bit cell inside the data body (after lead 48 + preamble 32 bits)
    s = (48 + 32 + 40) * 5
    pcm[s : s + 5] = -pcm[s : s + 5].astype(np.int32)
    dec = AisDecoder()
    msgs = dec.on_pcm(pcm)
    assert msgs == []
    assert dec.crc_rejects >= 1


def test_streaming_blocks_equal_oneshot():
    pcm = gen.generate([POS, BASE, VOYAGE])
    dec = AisDecoder()
    out = []
    for i in range(0, len(pcm), 1024):
        out.extend(dec.on_pcm(pcm[i : i + 1024]))
    assert [m.mmsi for m in out] == [367001234, 3669999, 366123456]


def test_demodulator_emits_raw_packets():
    demod = AisDemodulator()
    pkts = demod.on_pcm(gen.generate([POS]))
    assert pkts == [POS]


def test_through_tpu_channelizer():
    """AIS NRZI baseband -> NBFM at an offset -> exact channelize+demod at
    48 kHz -> decode."""
    from tsl_sdr_tpu.models.channelizer import MultifmChain
    from tsl_sdr_tpu.utils.filter_design import firdes_low_pass

    decim = 16
    fs = 48000 * decim  # 768 ksps
    offset = 90_000

    baseband = gen.generate([POS, BASE], amplitude=6000)
    dev = baseband.astype(np.float64) / 16384.0 * (48000 / 2)
    inst = 2 * np.pi * (offset + dev) / fs
    phase = np.cumsum(np.repeat(inst, decim))
    rng = np.random.default_rng(21)
    iq = np.stack([np.cos(phase), np.sin(phase)], -1) * 9000
    iq = (iq + rng.normal(scale=120, size=iq.shape)).astype(np.int16)
    # pad so process_array keeps the full burst
    iq = np.concatenate([iq, np.zeros((decim * 8192, 2), np.int16)])

    lpf = firdes_low_pass(1.0, fs, 24_000, 12_000)
    chain = MultifmChain(lpf, [offset], fs, decim, exact=True)
    pcm = chain.process_array(iq, block_size=decim * 4096)[0]

    msgs = AisDecoder().on_pcm(pcm)
    assert [m.mmsi for m in msgs] == [367001234, 3669999]
    assert abs(msgs[0].latitude - 37.7749) < 1e-5


def test_scan_equals_on_pcm():
    """Vectorized preamble fast-forward produces the FSM's exact messages."""
    rng = np.random.default_rng(55)
    parts = [
        rng.integers(-8000, 8000, size=300_000, dtype=np.int64).astype(np.int16),
        gen.generate([POS]),
        rng.integers(-8000, 8000, size=150_000, dtype=np.int64).astype(np.int16),
        gen.generate([BASE, VOYAGE]),
        rng.integers(-8000, 8000, size=200_000, dtype=np.int64).astype(np.int16),
    ]
    pcm = np.concatenate(parts)
    ref = AisDecoder().on_pcm(pcm)
    got = AisDecoder().scan(pcm)
    assert [type(m).__name__ for m in got] == [type(m).__name__ for m in ref]
    assert [m.mmsi for m in got] == [m.mmsi for m in ref]
    assert len(got) == 3


def test_scan_noise_fast_and_empty():
    rng = np.random.default_rng(56)
    pcm = rng.integers(-8000, 8000, size=2_000_000, dtype=np.int64).astype(np.int16)
    import time
    # load-robust bound: calibrate the per-sample python FSM rate on this
    # box (ADVICE r1); the default decoder (native FSM or vectorized scan)
    # must beat it comfortably
    from tsl_sdr_tpu.models.ais import AisDemodulator
    ref = AisDemodulator(native=False, vectorized=False)
    t0 = time.perf_counter()
    ref.on_pcm(pcm[:50_000])
    fsm_rate = 50_000 / (time.perf_counter() - t0)
    t0 = time.perf_counter()
    assert AisDecoder().scan(pcm) == []
    scan_rate = len(pcm) / (time.perf_counter() - t0)
    assert scan_rate > 5 * fsm_rate, (scan_rate, fsm_rate)


def test_class_b_position_report_roundtrip():
    """Type 18 (beyond-reference extension): generate -> demod -> decode."""
    from tsl_sdr_tpu.models.ais import AisClassBPositionReport
    from tsl_sdr_tpu.utils.jsonout import ais_message_json

    pkt = gen.make_class_b_position_report(
        368001122, speed_over_ground=7.3, longitude=-71.0589,
        latitude=42.3601, course=953, heading=96, timestamp=17,
    )
    msgs = AisDecoder().on_pcm(gen.generate([pkt]))
    assert len(msgs) == 1
    m = msgs[0]
    assert isinstance(m, AisClassBPositionReport)
    assert m.mmsi == 368001122
    assert abs(m.speed_over_ground - 7.3) < 0.05
    assert abs(m.longitude - (-71.0589)) < 1e-4
    assert abs(m.latitude - 42.3601) < 1e-4
    assert m.course == 953 and m.heading == 96 and m.timestamp == 17
    j = ais_message_json(m)
    assert '"type":"classBPositionReport"' in j and '"mmsi":368001122' in j


def test_static_data_report_roundtrip():
    """Type 24 parts A and B (beyond-reference extension)."""
    from tsl_sdr_tpu.models.ais import AisStaticDataReport
    from tsl_sdr_tpu.utils.jsonout import ais_message_json

    pa = gen.make_static_data_report(368005555, part="A",
                                     ship_name="SEA FUZZER")
    pb = gen.make_static_data_report(368005555, part="B", ship_type=36,
                                     vendor_id="ACME", callsign="WXY9876",
                                     dims=(12, 4, 3, 2))
    msgs = AisDecoder().on_pcm(gen.generate([pa, pb]))
    assert len(msgs) == 2
    a, b = msgs
    assert isinstance(a, AisStaticDataReport) and a.part == "A"
    assert a.ship_name.startswith("SEA FUZZER")
    assert b.part == "B" and b.ship_type == 36
    assert b.callsign.startswith("WXY9876")
    assert (b.dim_to_bow, b.dim_to_stern) == (12, 4)
    assert '"staticDataReportA"' in ais_message_json(a)
    assert '"staticDataReportB"' in ais_message_json(b)


def test_aid_to_navigation_roundtrip():
    """Type 21 (beyond-reference extension)."""
    from tsl_sdr_tpu.models.ais import AisAidToNavigationReport
    from tsl_sdr_tpu.utils.jsonout import ais_message_json

    pkt = gen.make_aid_to_navigation(
        993672085, aid_type=19, name="RACON BUOY 7", longitude=-70.25,
        latitude=42.125, dims=(3, 3, 2, 2), timestamp=61, off_position=True,
        virtual_aid=False)
    msgs = AisDecoder().on_pcm(gen.generate([pkt]))
    assert len(msgs) == 1
    m = msgs[0]
    assert isinstance(m, AisAidToNavigationReport)
    assert m.mmsi == 993672085 and m.aid_type == 19
    assert m.name.rstrip("@ ") == "RACON BUOY 7"
    assert abs(m.longitude - (-70.25)) < 1e-5
    assert abs(m.latitude - 42.125) < 1e-5
    assert m.off_position and not m.virtual_aid
    j = ais_message_json(m)
    assert '"type":"aidToNavigation"' in j and '"offPosition":true' in j


def test_long_range_position_roundtrip():
    """Type 27 (beyond-reference extension)."""
    from tsl_sdr_tpu.models.ais import AisLongRangePositionReport
    from tsl_sdr_tpu.utils.jsonout import ais_message_json

    pkt = gen.make_long_range_position(
        366999000, nav_stat=3, longitude=-145.5, latitude=-38.25,
        speed_over_ground=17, course=305, raim=True)
    msgs = AisDecoder().on_pcm(gen.generate([pkt]))
    assert len(msgs) == 1
    m = msgs[0]
    assert isinstance(m, AisLongRangePositionReport)
    assert m.mmsi == 366999000 and m.nav_stat == 3 and m.raim
    assert abs(m.longitude - (-145.5)) < 1e-3
    assert abs(m.latitude - (-38.25)) < 1e-3
    assert m.speed_over_ground == 17 and m.course == 305
    j = ais_message_json(m)
    assert '"type":"longRangePosition"' in j


def test_safety_message_roundtrip():
    """Types 14 (broadcast) and 12 (addressed) safety text messages
    (beyond-reference) through the full demodulator."""
    from tsl_sdr_tpu.models.ais import AisDecoder, AisSafetyMessage
    from tsl_sdr_tpu.utils.jsonout import ais_message_json

    bcast = gen.make_safety_broadcast(366111222, "MAYDAY RELAY POS 42N070W")
    # trailing space is representable 6-bit payload, NOT padding (only
    # '@' pads per ITU-R M.1371) — it must survive the decode
    addr = gen.make_addressed_safety(
        366111222, 367999888, "PLS CONFIRM ETA ", seqno=2, retransmit=True)
    msgs = AisDecoder().on_pcm(gen.generate([bcast, addr]))
    assert len(msgs) == 2
    b, a = msgs
    assert isinstance(b, AisSafetyMessage) and b.dest_mmsi is None
    assert b.mmsi == 366111222
    assert b.text == "MAYDAY RELAY POS 42N070W"
    jb = ais_message_json(b)
    assert '"type":"safetyBroadcast"' in jb and "MAYDAY RELAY" in jb
    assert isinstance(a, AisSafetyMessage)
    assert a.dest_mmsi == 367999888 and a.seqno == 2 and a.retransmit
    assert a.text == "PLS CONFIRM ETA "
    ja = ais_message_json(a)
    assert '"type":"addressedSafetyMessage"' in ja
    assert '"destMmsi":367999888' in ja


def test_binary_message_roundtrip():
    """Types 8 (broadcast) and 6 (addressed) binary application messages
    (beyond-reference): DAC/FI keyed, payload carried verbatim as hex."""
    from tsl_sdr_tpu.models.ais import AisBinaryMessage, AisDecoder
    from tsl_sdr_tpu.utils.jsonout import ais_message_json

    payload = bytes([0xDE, 0xAD, 0xBE, 0xEF, 0x80])
    bcast = gen.make_binary_broadcast(
        366333444, dac=1, fi=31, data=payload, data_bits=37)
    addr = gen.make_addressed_binary(
        366333444, 368000111, dac=235, fi=10, data=b"\xa5\x5a", seqno=1)
    msgs = AisDecoder().on_pcm(gen.generate([bcast, addr]))
    assert len(msgs) == 2
    b, a = msgs
    assert isinstance(b, AisBinaryMessage) and b.dest_mmsi is None
    assert (b.mmsi, b.dac, b.fi) == (366333444, 1, 31)
    # the HDLC frame is byte-aligned, so the 37 transmitted payload bits
    # arrive as 40 (3 zero pad bits) — the payload itself is verbatim
    assert b.data_bits == 40
    assert bytes.fromhex(b.data) == payload
    jb = ais_message_json(b)
    assert '"type":"binaryBroadcast"' in jb and '"dac":1' in jb
    assert isinstance(a, AisBinaryMessage)
    assert a.dest_mmsi == 368000111 and (a.dac, a.fi) == (235, 10)
    assert a.seqno == 1 and a.data_bits == 16
    assert bytes.fromhex(a.data) == b"\xa5\x5a"
    ja = ais_message_json(a)
    assert '"type":"addressedBinaryMessage"' in ja


def test_sar_aircraft_report_roundtrip():
    """Type 9 (beyond-reference): full air chain decode through the
    demodulator."""
    from tsl_sdr_tpu.models.ais import AisDecoder

    pkt = gen.make_sar_aircraft_report(
        111222333, altitude=950, speed_over_ground=180.0, position_acc=1,
        longitude=-71.5, latitude=41.2, course=2700, timestamp=33)
    sig = gen.generate([pkt])
    (msg,) = AisDecoder().on_pcm(sig)
    assert msg.mmsi == 111222333
    assert msg.altitude == 950
    assert msg.speed_over_ground == 180.0
    assert abs(msg.longitude - (-71.5)) < 1e-5
    assert abs(msg.latitude - 41.2) < 1e-5
    assert msg.course == 2700 and msg.timestamp == 33


def test_extended_class_b_roundtrip():
    """Type 19 (beyond-reference): kinematics + name/type/dims in one
    message."""
    from tsl_sdr_tpu.models.ais import AisDecoder

    pkt = gen.make_extended_class_b_report(
        987654321, speed_over_ground=12.3, longitude=4.5, latitude=52.4,
        course=900, heading=123, timestamp=41, name="WINDFARM GUARD",
        ship_type=52, dims=(12, 8, 3, 4), epfd_type=1)
    sig = gen.generate([pkt])
    (msg,) = AisDecoder().on_pcm(sig)
    assert msg.mmsi == 987654321
    assert msg.speed_over_ground == 12.3
    assert msg.name.rstrip("@ ") == "WINDFARM GUARD"
    assert msg.ship_type == 52
    assert (msg.dim_to_bow, msg.dim_to_stern, msg.dim_to_port,
            msg.dim_to_starboard) == (12, 8, 3, 4)
    assert msg.epfd_type == 1 and msg.heading == 123


def test_control_message_types_roundtrip():
    """Types 7/10/11/13/15/16/17/20/22/23 (beyond-reference extensions:
    link-layer control + DGNSS messages, ITU-R M.1371-5) through the full
    demodulator and their JSON forms."""
    from tsl_sdr_tpu.models.ais import (
        AisAcknowledge,
        AisAssignmentCommand,
        AisBaseStationReport,
        AisChannelManagement,
        AisDataLinkManagement,
        AisDecoder,
        AisDgnssBroadcast,
        AisGroupAssignment,
        AisInterrogation,
        AisUtcInquiry,
    )
    from tsl_sdr_tpu.utils.jsonout import ais_message_json

    pkts = [
        gen.make_acknowledge(366000001, [(367000001, 1), (367000002, 3)]),
        gen.make_acknowledge(366000001, [(367000009, 0)], msg_id=13),
        gen.make_utc_inquiry(366000002, 367000003),
        gen.make_utc_response(3669705, year=2026, month=8, day=18,
                              hour=4, minute=30, second=7,
                              longitude=-122.5, latitude=37.75),
        gen.make_interrogation(366000004, [(367000005, 5, 100),
                                           (367000005, 24, 200),
                                           (367000006, 3, 300)]),
        gen.make_assignment_command(366000007, [(367000008, 1111, 125),
                                                (367000010, 2222, 250)]),
        gen.make_dgnss_broadcast(3669708, longitude=-70.1, latitude=41.9,
                                 data=b"\xde\xad\xbe\xef"),
        gen.make_data_link_management(3669711, [(12, 5, 7, 250),
                                                (1000, 1, 3, 1125)]),
        gen.make_channel_management(3669712, channel_a=2087, channel_b=2088,
                                    txrx_mode=1, power=1, ne_lon=-69.5,
                                    ne_lat=43.0, sw_lon=-71.5, sw_lat=41.0,
                                    band_a=1, zone_size=4),
        gen.make_channel_management(3669712, dest1=367000020,
                                    dest2=367000021),
        gen.make_group_assignment(3669713, ne_lon=-69.0, ne_lat=44.0,
                                  sw_lon=-72.0, sw_lat=40.5, station_type=6,
                                  ship_type=30, txrx_mode=1, interval=9,
                                  quiet_time=5),
    ]
    msgs = AisDecoder().on_pcm(gen.generate(pkts))
    assert len(msgs) == len(pkts), [type(m).__name__ for m in msgs]

    ack7, ack13, inq, utc, interro, assign, dgnss, dlm, chb, cha, grp = msgs
    assert isinstance(ack7, AisAcknowledge) and ack7.msg_id == 7
    assert ack7.acks == [(367000001, 1), (367000002, 3)]
    assert '"type":"binaryAcknowledge"' in ais_message_json(ack7)
    assert ack13.msg_id == 13 and ack13.acks == [(367000009, 0)]
    assert '"type":"safetyAcknowledge"' in ais_message_json(ack13)

    assert isinstance(inq, AisUtcInquiry) and inq.dest_mmsi == 367000003
    assert '"type":"utcInquiry"' in ais_message_json(inq)

    assert isinstance(utc, AisBaseStationReport) and utc.msg_id == 11
    assert utc.mmsi == 3669705 and utc.hour == 4 and utc.second == 7
    assert abs(utc.longitude - (-122.5)) < 1e-5
    assert '"type":"utcDateResponse"' in ais_message_json(utc)

    assert isinstance(interro, AisInterrogation)
    assert interro.targets == [(367000005, 5, 100), (367000005, 24, 200),
                               (367000006, 3, 300)]
    assert '"type":"interrogation"' in ais_message_json(interro)

    assert isinstance(assign, AisAssignmentCommand)
    assert assign.assignments == [(367000008, 1111, 125),
                                  (367000010, 2222, 250)]
    assert '"type":"assignmentCommand"' in ais_message_json(assign)

    assert isinstance(dgnss, AisDgnssBroadcast)
    assert abs(dgnss.longitude - (-70.1)) < 1e-2
    assert abs(dgnss.latitude - 41.9) < 1e-2
    assert dgnss.data_bits == 32 and dgnss.data == "deadbeef"
    assert '"type":"dgnssBroadcast"' in ais_message_json(dgnss)

    assert isinstance(dlm, AisDataLinkManagement)
    assert dlm.reservations == [(12, 5, 7, 250), (1000, 1, 3, 1125)]
    assert '"type":"dataLinkManagement"' in ais_message_json(dlm)

    assert isinstance(chb, AisChannelManagement) and not chb.addressed
    assert chb.channel_a == 2087 and chb.txrx_mode == 1 and chb.power == 1
    assert abs(chb.ne_lat - 43.0) < 1e-2 and abs(chb.sw_lon + 71.5) < 1e-2
    assert chb.band_a == 1 and chb.zone_size == 4
    assert '"type":"channelManagement"' in ais_message_json(chb)
    assert cha.addressed and cha.dest1 == 367000020 \
        and cha.dest2 == 367000021
    assert '"destMmsi1":367000020' in ais_message_json(cha)

    assert isinstance(grp, AisGroupAssignment)
    assert grp.station_type == 6 and grp.ship_type == 30
    assert grp.interval == 9 and grp.quiet_time == 5
    assert abs(grp.sw_lat - 40.5) < 1e-2
    assert '"type":"groupAssignment"' in ais_message_json(grp)


def test_slot_binary_messages_roundtrip():
    """Types 25/26 (single-/multi-slot binary, beyond-reference) — with
    this, every ITU-R M.1371 message type (1-27) decodes."""
    from tsl_sdr_tpu.models.ais import AisDecoder, AisSlotBinaryMessage
    from tsl_sdr_tpu.utils.jsonout import ais_message_json

    pkts = [
        gen.make_slot_binary(366000030, data=b"\x12\x34"),
        gen.make_slot_binary(366000031, dest_mmsi=367000032, app_id=0x1234,
                             data=b"\xab\xcd\xef"),
        gen.make_slot_binary(366000033, msg_id=26, app_id=77,
                             data=b"\x55\xaa", radio_status=0x5A5A5),
    ]
    msgs = AisDecoder().on_pcm(gen.generate(pkts))
    assert len(msgs) == 3, [type(m).__name__ for m in msgs]
    plain, addr, multi = msgs
    assert isinstance(plain, AisSlotBinaryMessage) and plain.msg_id == 25
    assert not plain.addressed and not plain.structured
    assert plain.data.startswith("1234")
    assert '"type":"singleSlotBinary"' in ais_message_json(plain)

    assert addr.addressed and addr.structured
    assert addr.dest_mmsi == 367000032 and addr.app_id == 0x1234
    assert addr.data.startswith("abcdef")
    assert '"destMmsi":367000032' in ais_message_json(addr)

    assert multi.msg_id == 26 and multi.radio_status == 0x5A5A5
    assert multi.app_id == 77 and multi.data.startswith("55aa")
    j = ais_message_json(multi)
    assert '"type":"multiSlotBinary"' in j and '"radioStatus":370085' in j


def test_nmea_aivdm_sentences():
    """NMEA 0183 re-emission: armor/fill/checksum correct, payload
    de-armors back to the exact packet bytes, long packets split into
    a multi-sentence group with a shared sequential id."""
    from tsl_sdr_tpu.models.ais import nmea_aivdm, nmea_dearmor

    def cksum_ok(s):
        assert s.startswith("!") and s[-3] == "*"
        body, ck = s[1:-3], int(s[-2:], 16)
        x = 0
        for c in body:
            x ^= ord(c)
        return x == ck

    # single sentence: a 168-bit position report = 28 chars, 0 fill
    sents = nmea_aivdm(POS)
    assert len(sents) == 1 and cksum_ok(sents[0])
    f = sents[0][1:-3].split(",")
    assert f[0] == "AIVDM" and f[1] == "1" and f[2] == "1" and f[3] == ""
    assert f[4] == "A" and f[6] == "0"
    assert nmea_dearmor(f[5], int(f[6])) == POS
    assert f[5] == ascii_armor(POS)  # 21 bytes: armor forms agree

    # multi-sentence: a 424-bit type 5 = 71 chars -> 2 sentences
    sents = nmea_aivdm(VOYAGE, channel="B", seq=7)
    assert len(sents) == 2 and all(cksum_ok(s) for s in sents)
    p1 = sents[0][1:-3].split(",")
    p2 = sents[1][1:-3].split(",")
    assert p1[1] == "2" and p1[2] == "1" and p2[2] == "2"
    assert p1[3] == p2[3] == "7" and p1[4] == "B"
    assert p1[6] == "0"  # fill only on the last sentence
    assert nmea_dearmor(p1[5] + p2[5], int(p2[6])) == VOYAGE


def test_decoder_cli_nmea_output(tmp_path):
    """decoder-tpu --nmea: JSON and standard AIVDM emitted side by side."""
    import json
    from tsl_sdr_tpu.cli import decoder as decoder_cli
    from tsl_sdr_tpu.models.ais import nmea_dearmor

    src = tmp_path / "ais.pcm"
    gen.generate([POS, VOYAGE]).tofile(src)
    filt = tmp_path / "filt.json"
    filt.write_text(json.dumps({"lpfCoeffs": [1.0]}))
    out = tmp_path / "out.json"
    nmea = tmp_path / "out.nmea"

    rc = decoder_cli.main([
        "-m", "ais", "-I", "1", "-D", "1", "-S", "48000",
        "-F", str(filt), "-f", "161975000", "-o", str(out),
        "--nmea", str(nmea), "-c", str(src),
    ])
    assert rc == 0
    lines = nmea.read_text().splitlines()
    assert len(lines) == 3  # 1 for POS + 2 for the long type 5
    assert all(ln.startswith("!AIVDM,") for ln in lines)
    f0 = lines[0][1:-3].split(",")
    assert nmea_dearmor(f0[5], int(f0[6])) == POS
    assert len([json.loads(x) for x in out.read_text().splitlines()]) == 2

    # --nmea demands -m ais
    assert decoder_cli.main([
        "-m", "pocsag", "-I", "1", "-D", "1", "-S", "38400",
        "-F", str(filt), "-f", "0", "--nmea", "-", "-o", str(out),
        "-c", str(src)]) == 2


def test_interrogation_two_distinct_stations():
    """Regression: the two-DISTINCT-station type 15 form (the generator
    once sized its buffer only for the same-station variant)."""
    from tsl_sdr_tpu.models.ais import decode_fields

    pkt = gen.make_interrogation(366000004, [(367000005, 5, 100),
                                             (367000006, 3, 300)])
    m = decode_fields(pkt)
    assert m.targets == [(367000005, 5, 100), (367000006, 3, 300)]
    with pytest.raises(ValueError):
        gen.make_interrogation(1, [(2, 1, 1), (3, 1, 1), (4, 1, 1)])
