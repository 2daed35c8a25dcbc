"""Continuous-downlink TX/RX: TDMA counting, blind acquisition, cell
scrambling separation, AACH, SYSINFO, and the full IQ round trip.

All of this is capability beyond the reference (its decoder free-runs a
22-bit correlator with no frame numbering or channel coding,
decoder.py:171-295)."""

import numpy as np
import pytest

from tetraear_tpu.models.downlink import (DownlinkConfig, DownlinkReceiver,
                                          DownlinkTransmitter, advance_tdma)
from tetraear_tpu.utils.synth import make_mac_block_bits


@pytest.fixture(scope="module")
def cell():
    return DownlinkConfig(mcc=262, mnc=1001, colour_code=17,
                          location_area=999, main_carrier=3600,
                          frequency_band=3)


class TestTdmaCounting:
    def test_slot_advance(self):
        assert advance_tdma(1, 1, 1, 1) == (2, 1, 1)
        assert advance_tdma(4, 1, 1, 1) == (1, 2, 1)
        assert advance_tdma(4, 18, 1, 1) == (1, 1, 2)
        assert advance_tdma(4, 18, 60, 1) == (1, 1, 1)

    def test_multi_slot_advance_matches_iteration(self):
        tn, fn, mn = 3, 17, 59
        state = (tn, fn, mn)
        for _ in range(100):
            state = advance_tdma(*state, 1)
        assert state == advance_tdma(tn, fn, mn, 100)


class TestBitLevelRoundTrip:
    def test_full_multiframe_slice(self, cell):
        tx = DownlinkTransmitter(cell)
        payloads = {k: make_mac_block_bits(f"SLOT {k}".encode(), seed=k)
                    for k in range(16) if (k % 4) != 0}   # TN1 = sync slots
        bits = tx.stream_bits(16, payloads)
        assert bits.size == 16 * 510

        frames = DownlinkReceiver().receive_bits(bits)
        assert len(frames) == 16
        assert all(f.crc_ok for f in frames)

        for k, f in enumerate(frames):
            if k % 4 == 0:
                assert f.burst_kind == "SB"
                assert f.sync_pdu is not None
                assert f.sync_pdu.mcc == 262 and f.sync_pdu.mnc == 1001
                assert f.sync_pdu.frame_number == f.fn
                assert f.sync_pdu.timeslot + 1 == f.tn == 1
                assert f.sysinfo is not None
                assert f.sysinfo.location_area == 999
                assert f.sysinfo.main_carrier == 3600
                assert f.aach.downlink_usage == "common_control"
            else:
                assert f.burst_kind == "NDB"
                np.testing.assert_array_equal(
                    f.mac_bits, make_mac_block_bits(f"SLOT {k}".encode(),
                                                    seed=k))
                assert f.mac_pdu is not None
                assert bytes(f.mac_pdu.data) == f"SLOT {k}".encode()
                assert f.aach.downlink_usage == "common_control"

    def test_tdma_coordinates_advance(self, cell):
        tx = DownlinkTransmitter(cell)
        bits = tx.stream_bits(9)
        frames = DownlinkReceiver().receive_bits(bits)
        tns = [f.tn for f in frames]
        fns = [f.fn for f in frames]
        assert tns == [1, 2, 3, 4, 1, 2, 3, 4, 1]
        assert fns == [1, 1, 1, 1, 2, 2, 2, 2, 3]

    def test_acquisition_from_unaligned_start(self, cell):
        tx = DownlinkTransmitter(cell)
        payloads = {k: make_mac_block_bits(b"UNALIGNED", seed=k)
                    for k in range(12) if (k % 4) != 0}
        bits = tx.stream_bits(12, payloads)
        cut = bits[733:]                      # drop 733 bits mid-slot
        frames = DownlinkReceiver().receive_bits(cut)
        # slot 0 (SB) and the partial slot 1 are gone; the rest decode
        assert len(frames) >= 9
        assert all(f.crc_ok for f in frames)
        sbs = [f for f in frames if f.burst_kind == "SB"]
        assert sbs and all(f.tn == 1 for f in sbs)
        # fn/mn picked up correctly from the first decodable SB and
        # rewound onto earlier slots
        ndbs = [f for f in frames if f.burst_kind == "NDB"]
        assert all(bytes(f.mac_pdu.data) == b"UNALIGNED" for f in ndbs)

    def test_mid_multiframe_origin(self):
        cfg = DownlinkConfig(start_tn=3, start_fn=17, start_mn=60)
        tx = DownlinkTransmitter(cfg)
        bits = tx.stream_bits(10)
        frames = DownlinkReceiver().receive_bits(bits)
        assert [(f.tn, f.fn, f.mn) for f in frames[:3]] == [
            (3, 17, 60), (4, 17, 60), (1, 18, 60)]
        # multiframe wrap: fn 18 -> 1 rolls mn 60 -> 1
        wrap = [f for f in frames if f.fn == 1]
        assert wrap and all(f.mn == 1 for f in wrap)

    def test_cell_scrambling_separation(self):
        a = DownlinkConfig(mcc=262, mnc=1, colour_code=1)
        b = DownlinkConfig(mcc=262, mnc=2, colour_code=9)
        pay = {1: make_mac_block_bits(b"CELL PAYLOAD")}
        bits_a = DownlinkTransmitter(a).stream_bits(4, pay)
        frames = DownlinkReceiver().receive_bits(bits_a)
        # receiver derives cell A's scrambling from its BSCH — NDB decodes
        ndb = [f for f in frames if f.burst_kind == "NDB"]
        assert any(f.crc_ok and f.mac_pdu for f in ndb)
        # stream from cell B parses with B's identity, not A's
        frames_b = DownlinkReceiver().receive_bits(
            DownlinkTransmitter(b).stream_bits(4, pay))
        sb = [f for f in frames_b if f.sync_pdu][0]
        assert (sb.sync_pdu.mnc, sb.sync_pdu.colour_code) == (2, 9)


class TestTraffic:
    def test_tch_s_voice_slots(self, cell):
        from tetraear_tpu.audio.blocks import validate_block
        rng = np.random.default_rng(0)
        voc = rng.integers(0, 2, (3, 432)).astype(np.uint8)
        tx = DownlinkTransmitter(cell)
        bits = tx.stream_bits(16, tch_streams={3: ("TCH/S", voc, 1)})
        rx = DownlinkReceiver(traffic_channel="TCH/S")
        frames = rx.receive_bits(bits)
        voice = [f for f in frames if f.voice_block is not None]
        assert len(voice) == 3
        assert all(f.tn == 3 for f in voice)
        assert all(f.aach.downlink_usage == "traffic" for f in voice)
        for f, blk in zip(voice, voc):
            assert validate_block(f.voice_block)
            shorts = np.frombuffer(f.voice_block, "<i2")
            soft = np.concatenate([shorts[lo:hi] for lo, hi in
                                   ((1, 115), (116, 230), (231, 345),
                                    (346, 436))])[:432]
            np.testing.assert_array_equal((soft > 0).astype(np.uint8), blk)

    @pytest.mark.slow
    def test_tch48_depth4_stream(self, cell):
        rng = np.random.default_rng(1)
        blocks = rng.integers(0, 2, (5, 288)).astype(np.uint8)
        tx = DownlinkTransmitter(cell)
        # 5 blocks @ depth 4 -> 8 burst blocks on TN 2 -> need 8 frames
        bits = tx.stream_bits(32, tch_streams={2: ("TCH/4.8", blocks, 4)})
        rx = DownlinkReceiver(traffic_channel="TCH/4.8", traffic_depth=4)
        frames = rx.receive_bits(bits)
        out = rx.decode_traffic_stream(frames, tn=2)
        assert out.shape == (5, 288)
        np.testing.assert_array_equal(out, blocks)

    def test_tch72_inline_bits(self, cell):
        rng = np.random.default_rng(2)
        blocks = rng.integers(0, 2, (2, 432)).astype(np.uint8)
        tx = DownlinkTransmitter(cell)
        bits = tx.stream_bits(12, tch_streams={4: ("TCH/7.2", blocks, 1)})
        rx = DownlinkReceiver(traffic_channel="TCH/7.2")
        frames = rx.receive_bits(bits)
        got = [f.tch_bits for f in frames if f.tch_bits is not None]
        assert len(got) == 2
        np.testing.assert_array_equal(np.stack(got), blocks)

    def test_traffic_and_signalling_coexist(self, cell):
        rng = np.random.default_rng(3)
        voc = rng.integers(0, 2, (2, 432)).astype(np.uint8)
        pay = {1: make_mac_block_bits(b"MIXED"), 5: make_mac_block_bits(
            b"MIXED")}
        tx = DownlinkTransmitter(cell)
        bits = tx.stream_bits(12, payloads=pay,
                              tch_streams={3: ("TCH/S", voc, 1)})
        frames = DownlinkReceiver().receive_bits(bits)
        assert sum(f.voice_block is not None for f in frames) == 2
        sds = [f for f in frames if f.mac_pdu is not None
               and bytes(f.mac_pdu.data) == b"MIXED"]
        assert len(sds) == 2


class TestIQRoundTrip:
    def test_downlink_over_the_air(self, cell):
        tx = DownlinkTransmitter(cell)
        payloads = {k: make_mac_block_bits(f"AIR MSG {k}".encode(), seed=k)
                    for k in range(8) if (k % 4) != 0}
        bits = tx.stream_bits(8, payloads)
        iq = tx.modulate(bits, snr_db=25, seed=3)
        frames = DownlinkReceiver().receive(iq)
        good = [f for f in frames if f.crc_ok]
        assert len(good) >= 6
        sbs = [f for f in good if f.burst_kind == "SB"]
        assert sbs and sbs[0].sync_pdu.mcc == 262
        texts = {bytes(f.mac_pdu.data) for f in good
                 if f.mac_pdu is not None}
        assert any(t.startswith(b"AIR MSG") for t in texts)

    def test_empty_and_noise_only(self):
        rx = DownlinkReceiver()
        assert rx.receive(np.zeros(1000, np.complex64)) == []
        rng = np.random.default_rng(0)
        noise = (rng.standard_normal(200_000)
                 + 1j * rng.standard_normal(200_000)).astype(np.complex64)
        assert rx.receive(noise) == []


class TestMulticarrierDownlink:
    def test_three_cells_one_wideband_capture(self):
        """Three downlink cells on the 25 kHz grid in one wideband capture:
        each carrier blind-acquires its own cell (identity, SDS, TDMA) —
        BASELINE config 4 for the etsi profile."""
        from tetraear_tpu.models.downlink import MulticarrierDownlinkReceiver
        from tetraear_tpu.ops.channelizer import carrier_grid

        offsets = carrier_grid(3)
        cells = [DownlinkConfig(mcc=262, mnc=100 + c, colour_code=1 + c)
                 for c in range(3)]
        n = None
        mix = None
        for c, cfg in enumerate(cells):
            tx = DownlinkTransmitter(cfg)
            pay = {k: make_mac_block_bits(f"CELL{c} MSG".encode(), seed=c)
                   for k in (1, 5)}
            bits = tx.stream_bits(8, payloads=pay)
            iq = tx.modulate(bits, seed=c)
            t = np.arange(len(iq)) / 2.4e6
            shifted = iq * np.exp(2j * np.pi * offsets[c] * t)
            mix = shifted if mix is None else mix[:len(shifted)] + \
                shifted[:len(mix)]
        mix = (mix / 3).astype(np.complex64)

        rx = MulticarrierDownlinkReceiver(num_carriers=3)
        per_carrier = rx.receive(mix)
        assert len(per_carrier) == 3
        for c in range(3):
            frames = per_carrier[c]
            good = [f for f in frames if f.crc_ok]
            assert len(good) >= 5, f"carrier {c}: {len(good)} good frames"
            sb = [f for f in good if f.sync_pdu][0]
            assert sb.sync_pdu.mnc == 100 + c
            assert sb.sync_pdu.colour_code == 1 + c
            texts = {bytes(f.mac_pdu.data) for f in good
                     if f.mac_pdu is not None}
            assert f"CELL{c} MSG".encode() in texts


class TestEncryptedDownlink:
    def _encrypted_stream(self, key, alg, text, cell):
        from tetraear_tpu.crypto.tea import TEAEncryptor
        pt = text.encode()
        pt += b"\x00" * (-len(pt) % 8)
        ct = TEAEncryptor(key, alg).encrypt(pt)
        pay = {1: make_mac_block_bits(ct, encryption_mode=1, seed=1)}
        return DownlinkTransmitter(cell).stream_bits(4, pay)

    def test_common_key_bruteforce_recovers_text(self, cell):
        from tetraear_tpu.core.decoder import TetraDecoder
        key = TetraDecoder().common_keys["TEA1"][0]      # built-in key
        bits = self._encrypted_stream(key, "TEA1", "SECRET MESSAGE 123",
                                      cell)
        rx = DownlinkReceiver(auto_decrypt=True)
        frames = rx.receive_bits(bits)
        enc = [f for f in frames if f.encrypted]
        assert len(enc) == 1
        f = enc[0]
        assert f.decrypted and f.decrypt_score >= 80
        assert b"SECRET MESSAGE 123" in f.decrypted_data
        assert f.sds_message and "SECRET MESSAGE 123" in f.sds_message

    def test_user_key_decrypts_when_not_common(self, cell):
        key = bytes.fromhex("a1b2c3d4e5f60718293a")       # not in commons
        bits = self._encrypted_stream(key, "TEA1", "USER KEY TRAFFIC",
                                      cell)
        rx_with = DownlinkReceiver(auto_decrypt=True,
                                   keys=[key.hex()])
        f = [x for x in rx_with.receive_bits(bits) if x.encrypted][0]
        assert f.decrypted
        assert b"USER KEY TRAFFIC" in f.decrypted_data

        rx_without = DownlinkReceiver(auto_decrypt=True)
        g = [x for x in rx_without.receive_bits(bits) if x.encrypted][0]
        assert not g.decrypted or b"USER KEY TRAFFIC" not in (
            g.decrypted_data or b"")

    def test_clear_frames_not_marked_encrypted(self, cell):
        pay = {1: make_mac_block_bits(b"CLEAR TEXT")}
        bits = DownlinkTransmitter(cell).stream_bits(4, pay)
        frames = DownlinkReceiver(auto_decrypt=True).receive_bits(bits)
        assert not any(f.encrypted for f in frames)
        assert any(f.sds_message and "CLEAR TEXT" in f.sds_message
                   for f in frames)


class TestStealingAndControlFrame:
    def test_stolen_half_slot_carries_stch(self, cell):
        rng = np.random.default_rng(0)
        voc = rng.integers(0, 2, (3, 432)).astype(np.uint8)
        stch_bits = make_mac_block_bits(b"URGENT STCH", total_bits=124)
        tx = DownlinkTransmitter(cell)
        # TN3 traffic; steal the second TN3 slot (stream index 6)
        bits = tx.stream_bits(12, tch_streams={3: ("TCH/S", voc, 1)},
                              stch={6: stch_bits})
        frames = DownlinkReceiver().receive_bits(bits)
        stolen = [f for f in frames if f.stolen]
        assert len(stolen) == 1
        f = stolen[0]
        assert f.slot_index == 6 and f.tn == 3
        assert f.channel == "STCH+TCH/S"
        assert f.crc_ok
        assert bytes(f.mac_pdu.data) == b"URGENT STCH"
        # the un-stolen traffic slots still produce voice blocks
        voice = [g for g in frames if g.voice_block is not None]
        assert len(voice) == 2
        # the stolen slot still exposes its half traffic block (erasures)
        assert f.tch_llrs.shape == (432,)
        assert np.all(f.tch_llrs[216:] == 0)

    def test_frame18_pauses_traffic(self):
        cfg = DownlinkConfig(start_tn=1, start_fn=17, start_mn=1)
        rng = np.random.default_rng(1)
        voc = rng.integers(0, 2, (2, 432)).astype(np.uint8)
        tx = DownlinkTransmitter(cfg)
        # 12 slots: fn17 (4), fn18 (4), fn1 (4); TN2 is the traffic channel
        bits = tx.stream_bits(12, tch_streams={2: ("TCH/S", voc, 1)})
        frames = DownlinkReceiver().receive_bits(bits)
        tn2 = [f for f in frames if f.tn == 2]
        assert [f.fn for f in tn2] == [17, 18, 1]
        assert tn2[0].voice_block is not None        # fn17: traffic
        assert tn2[1].voice_block is None            # fn18: control frame
        assert tn2[1].channel == "SCH/F"
        assert tn2[2].voice_block is not None        # fn1: traffic resumes


class TestAfcAndBridge:
    def test_auto_afc_recovers_offset_cell(self, cell):
        tx = DownlinkTransmitter(cell)
        pay = {1: make_mac_block_bits(b"OFFSET CELL"),
               5: make_mac_block_bits(b"OFFSET CELL")}
        iq = tx.modulate(tx.stream_bits(8, payloads=pay), snr_db=25, seed=1)
        t = np.arange(len(iq)) / 2.4e6
        shifted = (iq * np.exp(2j * np.pi * 2800.0 * t)).astype(np.complex64)

        est = DownlinkReceiver.estimate_offset(shifted)
        assert abs(est - 2800.0) < 600.0

        frames = DownlinkReceiver().receive(shifted, freq_offset="auto")
        good = [f for f in frames if f.crc_ok]
        assert len(good) >= 6
        assert any(f.sds_message and "OFFSET CELL" in f.sds_message
                   for f in good)

    def test_frame_dict_bridge_feeds_session(self, cell):
        from tetraear_tpu.ui.session import SessionAggregator
        tx = DownlinkTransmitter(cell)
        pay = {1: make_mac_block_bits(b"BRIDGE MSG")}
        frames = DownlinkReceiver().receive_bits(tx.stream_bits(6, pay))
        agg = SessionAggregator()
        rows = [agg.on_frame(f.to_frame_dict()) for f in frames]
        assert len(rows) == 6
        d = [f.to_frame_dict() for f in frames]
        sb = [x for x in d if x["additional_info"]["burst"] == "SB"][0]
        assert sb["additional_info"]["mcc"] == 262
        assert sb["burst_crc"] is True
        schf = [x for x in d if x.get("sds_message")][0]
        assert "BRIDGE MSG" in schf["sds_message"]
        assert schf["type_name"] == "MAC-RESOURCE"
        assert schf["timeslot"] == 1          # TN2 -> reference 0-based


class TestCellSurvey:
    def test_survey_finds_all_cells(self):
        from tetraear_tpu.models.downlink import survey_cells
        from tetraear_tpu.ops.channelizer import carrier_grid
        offsets = carrier_grid(4)
        live = {0: (262, 101, 3), 2: (262, 202, 7)}   # carriers 1,3 empty
        mix = None
        n_keep = None
        for c, (mcc, mnc, cc_) in live.items():
            tx = DownlinkTransmitter(DownlinkConfig(mcc=mcc, mnc=mnc,
                                                    colour_code=cc_))
            iq = tx.modulate(tx.stream_bits(6), seed=c)
            t = np.arange(len(iq)) / 2.4e6
            s = iq * np.exp(2j * np.pi * offsets[c] * t)
            mix = s if mix is None else mix[:len(s)] + s[:len(mix)]
        mix = (mix / 2).astype(np.complex64)

        reports = survey_cells(mix, num_carriers=4)
        assert {r.carrier_index for r in reports} == {0, 2}
        by_c = {r.carrier_index: r for r in reports}
        assert (by_c[0].mnc, by_c[0].colour_code) == (101, 3)
        assert (by_c[2].mnc, by_c[2].colour_code) == (202, 7)
        assert all(r.crc_rate > 0.8 for r in reports)
        assert all(r.location_area == 999 for r in reports)

    def test_call_metadata_flows(self, cell):
        # a resource-assignment-looking MAC PDU should yield call metadata
        tx = DownlinkTransmitter(cell)
        pay = {1: make_mac_block_bits(bytes([0x01, 0x02, 0x03, 0x04,
                                             0x05]))}
        frames = DownlinkReceiver().receive_bits(tx.stream_bits(4, pay))
        schf = [f for f in frames if f.mac_pdu is not None]
        assert schf
        d = schf[0].to_frame_dict()
        # call_metadata may or may not parse depending on heuristics, but
        # the bridge must carry it as a dict when present
        if schf[0].call_metadata is not None:
            assert isinstance(d["call_metadata"], dict)


class TestSensitivity:
    """Pin the receive chain's SNR floor (tools/sensitivity_sweep.py
    methodology): the 25 kHz channel gets ~19.8 dB processing gain from
    the 2.4 MHz capture, so wideband -12 dB = in-band ~8 dB — where
    DQPSK + rate-2/3 soft Viterbi still decodes cleanly — while wideband
    -16 dB (in-band ~4 dB) must collapse (a pass there would mean the
    test is decoding something other than the air interface)."""

    def test_clean_at_8db_inband_collapsed_at_4db(self, cell):
        tx = DownlinkTransmitter(cell)
        pay = {k: make_mac_block_bits(b"FLOOR", seed=k)
               for k in range(8) if k % 4 != 0}
        bits = tx.stream_bits(8, payloads=pay)
        rx = DownlinkReceiver()

        iq = tx.modulate(bits, snr_db=-12.0, seed=0)
        frames = rx.receive(iq)
        assert sum(f.crc_ok for f in frames) == 7

        iq = tx.modulate(bits, snr_db=-16.0, seed=0)
        frames = rx.receive(iq)
        assert sum(f.crc_ok for f in frames) <= 2


class TestLayer3Downlink:
    """True MLE->CMCE/MM signalling through the downlink (protocol/
    layer3.py integration): the etsi replacement for the reference's
    heuristic call-metadata/SDS guessing (protocol.py:597-1018)."""

    def _run_sequence(self, cell, pdus, slots=24, group=0x2328, iq=False):
        tx = DownlinkTransmitter(cell)
        payloads = {}
        slot = 1
        for pdu in pdus:
            slot = tx.schedule_signalling(payloads, pdu, group, slot,
                                          slots)
        bits = tx.stream_bits(slots, payloads=payloads)
        rx = DownlinkReceiver()
        if iq:
            frames = rx.receive(tx.modulate(bits, snr_db=25, seed=3))
        else:
            frames = rx.receive_bits(bits)
        return rx, [r for f in frames if f.layer3 for r in f.layer3
                    if r.pdu is not None], frames

    def test_call_lifecycle_over_the_air(self, cell):
        from tetraear_tpu.protocol import cmce
        seq = [cmce.DSetup(call_identifier=41, call_priority=5,
                           calling_party=cmce.Address(1, 0x457)),
               cmce.DTxGranted(call_identifier=41, transmission_grant=1,
                               transmitting_party=cmce.Address(1, 0x457)),
               cmce.DTxCeased(call_identifier=41),
               cmce.DRelease(call_identifier=41, disconnect_cause=2)]
        rx, routed, frames = self._run_sequence(cell, seq, iq=True)
        names = [r.name for r in routed]
        assert names == ["DSetup", "DTxGranted", "DTxCeased", "DRelease"]
        # the ledger saw the whole lifecycle and closed the call
        assert not rx.call_tracker.calls
        rel = rx.call_tracker.released[0]
        assert rel.call_id == 41 and rel.disconnect_cause == 2
        assert rel.group_ssi == 0x2328 and rel.calling_ssi == 0x457
        # frames carry authoritative call metadata (not heuristics)
        metas = [f.call_metadata for f in frames if f.call_metadata]
        assert metas[0].call_type == "call_setup"
        assert metas[0].talkgroup_id == 0x2328
        assert metas[1].source_ssi == 0x457

    def test_fragmented_sds_text(self, cell):
        from tetraear_tpu.protocol import cmce, sds_tl
        text = ("Layer-3 SDS long enough to fragment across MAC-RESOURCE"
                " + FRAG + END on one TN, reassembled by the receiver's"
                " per-TN defragmenter before SDS-TL decode.")
        pdu = cmce.DSdsData(calling_party=cmce.Address(1, 99),
                            short_data_type=3,
                            data_bits=sds_tl.build_text_transfer(text))
        rx, routed, frames = self._run_sequence(cell, [pdu])
        assert any(f.sds_message == text for f in frames)
        sds = [r for r in routed if r.sds is not None]
        assert sds and sds[0].sds.text == text
        assert sds[0].mac_pdu.address == 0x2328

    def test_mm_location_update(self, cell):
        from tetraear_tpu.protocol import mm
        pdu = mm.DLocationUpdateAccept(location_update_accept_type=1,
                                       ssi=0xBEEF, subscriber_class=7)
        rx, routed, frames = self._run_sequence(cell, [pdu])
        assert routed[0].name == "DLocationUpdateAccept"
        assert routed[0].pdu.ssi == 0xBEEF

    def test_encrypted_layer3_structural_bruteforce(self, cell):
        from tetraear_tpu.core.decoder import TetraDecoder
        from tetraear_tpu.crypto.tea import TEAEncryptor
        from tetraear_tpu.protocol import cmce, sds_tl
        # second valid-length TEA1 common key (the list keeps the
        # reference's invalid-length entries too — a documented quirk)
        key = [k for k in TetraDecoder().common_keys["TEA1"]
               if len(k) == 10][1]
        tx = DownlinkTransmitter(cell)
        pdu = cmce.DSdsData(calling_party=cmce.Address(1, 7),
                            short_data_type=3,
                            data_bits=sds_tl.build_text_transfer(
                                "ENCRYPTED L3"))
        payloads = {}
        tx.schedule_signalling(payloads, pdu, 0x100, 1, 8,
                               encryption_mode=1,
                               encryptor=TEAEncryptor(key, "TEA1"))
        bits = tx.stream_bits(8, payloads=payloads)
        rx = DownlinkReceiver(auto_decrypt=True)
        frames = rx.receive_bits(bits)
        enc = [f for f in frames if f.encrypted]
        assert len(enc) == 1
        f = enc[0]
        assert f.decrypted and f.key_used.startswith("TEA1 common")
        assert f.sds_message == "ENCRYPTED L3"
        # structural acceptance re-routed the plaintext PDU
        assert any(r.name == "DSdsData" for r in f.layer3)

    def test_heuristic_fallback_still_works(self, cell):
        # reference-layout payloads must keep flowing through the
        # heuristic parser untouched by the layer-3 attempt
        tx = DownlinkTransmitter(cell)
        pay = {1: make_mac_block_bits(b"FALLBACK MSG")}
        frames = DownlinkReceiver().receive_bits(tx.stream_bits(4, pay))
        hit = [f for f in frames if f.sds_message
               and "FALLBACK MSG" in f.sds_message]
        assert hit and hit[0].layer3 is None
        assert hit[0].mac_pdu is not None

    def test_group_attachment_ledger(self, cell):
        from tetraear_tpu.protocol import mm
        pdu = mm.DAttachDetachGroupIdentity()
        pdu.set_groups([mm.GroupIdentity(gssi=9001, lifetime=2),
                        mm.GroupIdentity(gssi=9002, attach=False,
                                         detach_reason=2)])
        rx, routed, frames = self._run_sequence(cell, [pdu],
                                                group=0x555)
        assert routed[0].name == "DAttachDetachGroupIdentity"
        assert rx.group_attachments[9001]["attached"]
        assert rx.group_attachments[9001]["ssi"] == 0x555
        assert not rx.group_attachments[9002]["attached"]
        assert rx.group_attachments[9002]["detach_reason"] == 2

    @pytest.mark.slow
    def test_call_following_attributes_voice(self, cell):
        # D-SETUP allocates TN3; the voice stream on TN3 must be
        # attributed to the call's talkgroup from that point on
        from tetraear_tpu.protocol import cmce
        from tetraear_tpu.protocol.mac import ChannelAllocation
        rng = np.random.default_rng(4)
        voc = rng.integers(0, 2, (4, 432)).astype(np.uint8)
        tx = DownlinkTransmitter(cell)
        payloads = {}
        alloc = ChannelAllocation(allocation_type=1, timeslots=0b0010,
                                  carrier_number=3600)
        tx.schedule_signalling(
            payloads, cmce.DSetup(call_identifier=9, call_priority=2,
                                  calling_party=cmce.Address(1, 0x10)),
            0x5555, 1, 20, channel_allocation=alloc)
        bits = tx.stream_bits(20, payloads=payloads,
                              tch_streams={3: ("TCH/S", voc, 1)})
        rx = DownlinkReceiver()
        frames = rx.receive_bits(bits)
        setup = [f for f in frames if f.call_metadata
                 and f.call_metadata.call_type == "call_setup"][0]
        assert setup.call_metadata.channel_allocated == 3600
        voice = [f for f in frames if f.voice_block is not None]
        assert voice
        attributed = [f for f in voice if f.slot_index > setup.slot_index]
        assert attributed
        for f in attributed:
            assert f.call_metadata is not None
            assert f.call_metadata.call_identifier == 9
            assert f.call_metadata.talkgroup_id == 0x5555
            assert f.call_metadata.call_type == "traffic"
        # voice before the setup has no call to belong to
        for f in voice:
            if f.slot_index < setup.slot_index:
                assert f.call_metadata is None
        assert rx.call_tracker.calls[9].allocated_tns == [3]

    def test_nwrk_broadcast_feeds_network_info(self, cell):
        from tetraear_tpu.protocol import mle
        pdu = mle.DNwrkBroadcast(
            cell_reselect_parameters=5,
            neighbours=[mle.NeighbourCell(cell_identifier=1,
                                          main_carrier=3610),
                        mle.NeighbourCell(cell_identifier=2,
                                          main_carrier=3620)])
        tx = DownlinkTransmitter(cell)
        payloads = {}
        tx.schedule_signalling(payloads, pdu, 0, 1, 8,
                               pd=mle.PD.MLE)
        frames = None
        rx = DownlinkReceiver()
        frames = rx.receive_bits(tx.stream_bits(8, payloads=payloads))
        assert rx.network_info is not None
        assert [n.main_carrier for n in rx.network_info.neighbours] == \
            [3610, 3620]
        routed = [r for f in frames if f.layer3 for r in f.layer3]
        assert routed[0].name == "DNwrkBroadcast"
