"""Layer-3 stack: MAC PDU codecs, MLE routing, CMCE/MM PDUs, SDS-TL,
fragmentation, and the call tracker (protocol/{mac,mle,cmce,mm,sds_tl,
layer3}.py, core/calls.py)."""

import numpy as np
import pytest

from tetraear_tpu.core.calls import CallTracker
from tetraear_tpu.protocol import cmce, layer3, mac, mle, mm, sds_tl
from tetraear_tpu.protocol.bits import BitCursor
from tetraear_tpu.protocol.sds import pack_gsm7, unpack_gsm7

SCHF_BITS = 268


class TestGsm7Pack:
    def test_golden_vector(self):
        # the repo's one true golden vector (reference test_gsm7.py:8-13)
        assert pack_gsm7("hellohello").hex().upper() == \
            "E8329BFD4697D9EC37"

    def test_round_trip_with_extension_chars(self):
        text = "Status {OK} ~ 100% [done] €5"
        assert unpack_gsm7(pack_gsm7(text)) == text

    def test_unencodable_raises(self):
        with pytest.raises(ValueError):
            pack_gsm7("中")


class TestMacResource:
    def test_round_trip_plain(self):
        sdu = np.random.default_rng(0).integers(0, 2, 101).astype(np.uint8)
        r = mac.MacResource(address_type=mac.AddressType.SSI,
                            address=0x123456, encryption_mode=0,
                            tm_sdu=sdu)
        block = r.build(SCHF_BITS)
        assert block.size == SCHF_BITS
        out = mac.parse_mac_block(block)
        assert len(out) == 1
        got = out[0]
        assert got.address == 0x123456
        assert np.array_equal(got.tm_sdu, sdu)

    def test_fill_bits_removed_exactly(self):
        # SDU size chosen so the PDU is NOT octet-aligned -> fill needed
        for n in (1, 5, 99, 150):
            sdu = np.ones(n, np.uint8)  # all-ones worst case for stripping
            r = mac.MacResource(address=7, tm_sdu=sdu)
            got = mac.parse_mac_block(r.build(SCHF_BITS))[0]
            assert np.array_equal(got.tm_sdu, sdu), n

    def test_optional_elements(self):
        ca = mac.ChannelAllocation(allocation_type=1, timeslots=0b0100,
                                   carrier_number=3600, extended_flag=1,
                                   frequency_band=4, monitoring_pattern=0,
                                   frame18_pattern=2)
        r = mac.MacResource(address=42, power_control=9, slot_granting=0x5A,
                            channel_allocation=ca,
                            tm_sdu=np.zeros(10, np.uint8))
        got = mac.parse_mac_block(r.build(SCHF_BITS))[0]
        assert got.power_control == 9
        assert got.slot_granting == 0x5A
        assert got.channel_allocation.carrier_number == 3600
        assert got.channel_allocation.frequency_band == 4
        assert got.channel_allocation.frame18_pattern == 2

    def test_multiple_pdus_per_block(self):
        a = mac.MacResource(address=1, tm_sdu=np.ones(16, np.uint8))
        b = mac.MacResource(address=2, tm_sdu=np.zeros(8, np.uint8))
        block = mac.build_mac_block([a, b], SCHF_BITS)
        out = mac.parse_mac_block(block)
        assert [p.address for p in out] == [1, 2]

    def test_event_label_addressing(self):
        r = mac.MacResource(address_type=mac.AddressType.SSI_EVENT_LABEL,
                            address=0xABCDEF, address2=0x2A5,
                            tm_sdu=np.ones(9, np.uint8))
        got = mac.parse_mac_block(r.build(SCHF_BITS))[0]
        assert got.address == 0xABCDEF and got.address2 == 0x2A5

    def test_garbage_rejected(self):
        rng = np.random.default_rng(1)
        rejected = 0
        for _ in range(50):
            bits = rng.integers(0, 2, SCHF_BITS).astype(np.uint8)
            try:
                pdus = mac.parse_mac_block(bits)
                for p in pdus:
                    if isinstance(p, mac.MacResource):
                        layer3.decode_tm_sdu(p.tm_sdu)
            except ValueError:
                rejected += 1
        assert rejected >= 35  # strict parsing rejects most random blocks

    def test_reference_style_block_rejected_or_unconfident(self):
        # the ref-compat synthetic MAC layout must not be claimed by the
        # true layer-3 parse (downlink falls back to heuristics on it)
        from tetraear_tpu.utils.synth import make_mac_block_bits
        confident = 0
        for seed in range(20):
            bits = make_mac_block_bits(f"SLOT {seed}".encode(), seed=seed)
            try:
                for r in layer3.decode_mac_block(bits):
                    confident += bool(r.confident)
            except ValueError:
                pass
        assert confident == 0


class TestFragmentation:
    def test_single_block_no_frag(self):
        sdu = np.ones(100, np.uint8)
        first = mac.MacResource(address=5)
        parts = mac.fragment_tm_sdu(sdu, SCHF_BITS, first)
        assert len(parts) == 1
        assert not parts[0][0].fragmented

    def test_multi_block_reassembly(self):
        rng = np.random.default_rng(2)
        sdu = rng.integers(0, 2, 700).astype(np.uint8)
        first = mac.MacResource(address=5)
        parts = mac.fragment_tm_sdu(sdu, SCHF_BITS, first)
        assert len(parts) >= 3
        assert isinstance(parts[0][0], mac.MacResource)
        assert isinstance(parts[-1][0], mac.MacEnd)
        defrag = layer3.Defragmenter()
        got = None
        chunks = []
        for pdu, block in parts:
            assert block.size == SCHF_BITS
            res = mac.parse_mac_block(block)
            assert len(res) == 1
            chunks.append(res[0].tm_sdu)
        assert np.array_equal(np.concatenate(chunks), sdu)

    def test_length_sweep_round_trip(self):
        """Every TM-SDU length must build without tripping the block
        assertion and reassemble bit-exact — pins the borderline zone
        where header+sdu fits the block but the whole-octet LI rounding
        does not (e.g. totals 265-268 on SCH/F), which used to crash."""
        rng = np.random.default_rng(7)
        for n in range(0, 620):
            sdu = rng.integers(0, 2, n).astype(np.uint8)
            parts = mac.fragment_tm_sdu(sdu, SCHF_BITS,
                                        mac.MacResource(address=5))
            chunks = []
            for _, block in parts:
                assert block.size == SCHF_BITS
                res = mac.parse_mac_block(block)
                assert len(res) == 1
                chunks.append(res[0].tm_sdu)
            got = (np.concatenate(chunks) if chunks
                   else np.zeros(0, np.uint8))
            assert np.array_equal(got, sdu), f"length {n} corrupted"

    def test_mac_access_build_parse_inverse(self):
        """MacAccess build/parse are field-for-field inverses for both
        length_flag forms (the no-LI form used to be unproducible)."""
        from tetraear_tpu.protocol.bits import BitCursor
        sdu = np.asarray([1, 0, 1, 1, 0, 1], np.uint8)
        for lf in (0, 1):
            a = mac.MacAccess(address=0x1234, length_flag=lf, tm_sdu=sdu)
            blk = a.build(92)
            got = mac.MacAccess.parse(BitCursor(blk))
            assert got.length_flag == lf
            assert got.address == 0x1234
            assert np.array_equal(got.tm_sdu, sdu)

    def test_defragmenter_end_to_end(self):
        text = "A long SDS message that cannot fit into one SCH/F slot " \
               "and therefore rides MAC-RESOURCE + FRAG + END across the " \
               "downlink, reassembled by the receiver."
        tl = sds_tl.build_text_transfer(text, coding=sds_tl.Coding.LATIN1)
        pdu = cmce.DSdsData(calling_party=cmce.Address(1, 777),
                            short_data_type=3, data_bits=tl)
        tm = mle.wrap_mle(mle.PD.CMCE, pdu.build())
        parts = mac.fragment_tm_sdu(tm, SCHF_BITS,
                                    mac.MacResource(address=0x99))
        defrag = layer3.Defragmenter()
        done = None
        for _, block in parts:
            for res in layer3.decode_mac_block(block):
                assert res.fragment
                out = defrag.feed(res)
                if out is not None:
                    done = out
        assert done is not None and done.confident
        assert done.sds.text == text
        assert done.mac_pdu.address == 0x99


class TestMle:
    def test_round_trip(self):
        body = np.asarray([1, 0, 1, 1, 0, 0, 1], np.uint8)
        pd, out = mle.unwrap_mle(mle.wrap_mle(mle.PD.CMCE, body))
        assert pd == mle.PD.CMCE
        assert np.array_equal(out, body)

    def test_short_sdu_raises(self):
        with pytest.raises(ValueError):
            mle.unwrap_mle(np.asarray([1], np.uint8))


def _rt(pdu, uplink=False):
    """Round-trip a CMCE/MM PDU through its bit codec."""
    bits = pdu.build()
    if isinstance(pdu, (mm.DLocationUpdateAccept, mm.DLocationUpdateCommand,
                        mm.DLocationUpdateReject,
                        mm.DLocationUpdateProceeding,
                        mm.DAttachDetachGroupIdentity,
                        mm.DAttachDetachGroupIdentityAck, mm.DMmStatus)):
        return mm.parse_mm(bits)
    return cmce.parse_cmce(bits, uplink=uplink)


class TestCmcePdus:
    def test_d_setup_round_trip(self):
        p = cmce.DSetup(call_identifier=12345, call_timeout=3,
                        simplex_duplex=0, basic_service_info=0x00,
                        transmission_grant=1, call_priority=7,
                        notification_indicator=5,
                        calling_party=cmce.Address(2, 0x112233, 0x445566))
        q = _rt(p)
        assert isinstance(q, cmce.DSetup)
        assert q.call_identifier == 12345
        assert q.call_priority == 7
        assert q.calling_party.ssi == 0x112233
        assert q.calling_party.extension == 0x445566
        assert q.notification_indicator == 5
        assert q.temporary_address is None
        assert q.is_speech

    def test_d_setup_no_optionals(self):
        q = _rt(cmce.DSetup(call_identifier=9))
        assert q.call_identifier == 9 and q.calling_party is None

    def test_tx_grant_cycle(self):
        g = _rt(cmce.DTxGranted(call_identifier=77, transmission_grant=1,
                                transmitting_party=cmce.Address(1, 4242)))
        assert g.transmitting_party.ssi == 4242
        c = _rt(cmce.DTxCeased(call_identifier=77))
        assert c.call_identifier == 77

    def test_release_with_cause(self):
        q = _rt(cmce.DRelease(call_identifier=3, disconnect_cause=11,
                              notification_indicator=2))
        assert q.disconnect_cause == 11 and q.notification_indicator == 2

    def test_d_status(self):
        q = _rt(cmce.DStatus(calling_party=cmce.Address(1, 999),
                             precoded_status=0x8004))
        assert q.precoded_status == 0x8004 and q.calling_party.ssi == 999

    def test_type3_passthrough(self):
        ext = np.asarray([1, 0, 1, 1, 0], np.uint8)
        p = cmce.DSetup(call_identifier=1)
        p.type3.append((3, ext))          # facility element
        q = _rt(p)
        assert len(q.type3) == 1
        ident, bits = q.type3[0]
        assert ident == 3 and np.array_equal(bits, ext)

    def test_all_downlink_types_registered(self):
        for t, cls in cmce._DOWNLINK_REGISTRY.items():
            q = cmce.parse_cmce(cls().build())
            assert isinstance(q, cls), cls.__name__

    def test_uplink_pdus(self):
        p = cmce.USdsData(area_selection=2,
                          called_party=cmce.Address(1, 31337),
                          short_data_type=1, user_data=0xDEADBEEF)
        q = _rt(p, uplink=True)
        assert q.called_party.ssi == 31337
        assert q.user_data == 0xDEADBEEF

    def test_unknown_type_generic(self):
        bits = np.concatenate([
            np.asarray([1, 0, 1, 0, 1], np.uint8),  # type 21: unassigned
            np.ones(10, np.uint8)])
        q = cmce.parse_cmce(bits)
        assert isinstance(q, cmce.GenericCmce) and q.pdu_type == 21


class TestMmPdus:
    def test_location_update_accept(self):
        p = mm.DLocationUpdateAccept(location_update_accept_type=2,
                                     ssi=0xABCDE, subscriber_class=0xF0F0)
        q = _rt(p)
        assert q.location_update_accept_type == 2
        assert q.ssi == 0xABCDE and q.subscriber_class == 0xF0F0
        assert q.address_extension is None

    def test_reject(self):
        q = _rt(mm.DLocationUpdateReject(location_update_type=1,
                                         reject_cause=9))
        assert q.reject_cause == 9

    def test_group_attach_with_type4(self):
        p = mm.DAttachDetachGroupIdentity(group_identity_ack_request=1)
        p.type3.append((1, np.ones(30, np.uint8)))
        q = _rt(p)
        assert q.group_identity_ack_request == 1
        assert len(q.type3) == 1 and q.type3[0][1].size == 30

    def test_all_mm_types_registered(self):
        for t, cls in mm._REGISTRY.items():
            assert isinstance(mm.parse_mm(cls().build()), cls)


class TestSdsTl:
    @pytest.mark.parametrize("coding,text", [
        (sds_tl.Coding.GSM7, "hellohello"),
        (sds_tl.Coding.LATIN1, "Größe: çà-va?"),
        (sds_tl.Coding.UCS2, "Øresund — 北京 ok"),
    ])
    def test_text_codings(self, coding, text):
        out = sds_tl.parse_sds_tl(
            sds_tl.build_text_transfer(text, coding=coding,
                                       message_reference=42))
        assert out.text == text
        assert out.message_reference == 42
        assert out.protocol_id == sds_tl.PID_TEXT

    def test_gsm7_padding_septet_stripped(self):
        # 23 septets = 161 bits -> 21 bytes with 7 pad bits, which would
        # decode as a trailing '@' without the strip rule
        text = "DOWNLINK SDS via SDS-TL"
        out = sds_tl.parse_sds_tl(sds_tl.build_text_transfer(text))
        assert out.text == text

    def test_timestamp(self):
        out = sds_tl.parse_sds_tl(
            sds_tl.build_text_transfer("hi", timestamp=0x123456))
        assert out.timestamp == 0x123456 and out.text == "hi"

    def test_non_tl_pid_passthrough(self):
        t = sds_tl.SdsTransfer(protocol_id=0x0A, user_data=b"\x01\x02")
        out = sds_tl.parse_sds_tl(t.build())
        assert out.protocol_id == 0x0A and out.user_data == b"\x01\x02"


class TestLayer3EndToEnd:
    def _block(self, pdu, address=0x2001, pd=mle.PD.CMCE):
        tm = mle.wrap_mle(pd, pdu.build())
        r = mac.MacResource(address=address, tm_sdu=tm)
        return r.build(SCHF_BITS)

    def test_cmce_routing(self):
        res = layer3.decode_mac_block(self._block(
            cmce.DSetup(call_identifier=501,
                        calling_party=cmce.Address(1, 600))))
        assert len(res) == 1 and res[0].confident
        assert res[0].pdu.call_identifier == 501
        assert res[0].mac_pdu.address == 0x2001

    def test_mm_routing(self):
        res = layer3.decode_mac_block(self._block(
            mm.DLocationUpdateAccept(ssi=808), pd=mle.PD.MM))
        assert res[0].confident
        assert res[0].pdu.ssi == 808

    def test_sds_text_through_stack(self):
        tl = sds_tl.build_text_transfer("Meet at dock 4")
        pdu = cmce.DSdsData(calling_party=cmce.Address(1, 12),
                            short_data_type=3, data_bits=tl)
        res = layer3.decode_mac_block(self._block(pdu))
        assert res[0].confident
        assert res[0].sds.text == "Meet at dock 4"
        assert "Meet at dock 4" in layer3.describe_pdu(res[0])

    def test_encrypted_mac_not_routed(self):
        r = mac.MacResource(address=1, encryption_mode=2,
                            tm_sdu=np.ones(64, np.uint8))
        res = layer3.decode_mac_block(r.build(SCHF_BITS))
        assert res[0].pdu is None and not res[0].confident
        assert res[0].mac_pdu.encryption_mode == 2


class TestCallTracker:
    def test_group_call_lifecycle(self):
        tr = CallTracker()
        m = tr.update(cmce.DSetup(call_identifier=5, call_priority=3,
                                  calling_party=cmce.Address(1, 100)),
                      mac_address=9000)
        assert m.call_type == "call_setup"
        assert m.talkgroup_id == 9000 and m.source_ssi == 100
        m = tr.update(cmce.DTxGranted(call_identifier=5,
                                      transmission_grant=1,
                                      transmitting_party=cmce.Address(1,
                                                                      200)))
        assert m.call_type == "tx_granted" and m.source_ssi == 200
        assert tr.calls[5].state == "active"
        m = tr.update(cmce.DTxCeased(call_identifier=5))
        assert tr.calls[5].talker_ssi is None
        m = tr.update(cmce.DRelease(call_identifier=5, disconnect_cause=2))
        assert m.call_type == "call_release"
        assert 5 not in tr.calls and tr.released[0].disconnect_cause == 2

    def test_sds_pdu_returns_none(self):
        tr = CallTracker()
        assert tr.update(cmce.DSdsData()) is None
        assert tr.update(cmce.DStatus()) is None


class TestGroupIdentity:
    def test_element_round_trip(self):
        groups = [mm.GroupIdentity(gssi=9001, attach=True, lifetime=2,
                                   class_of_usage=3),
                  mm.GroupIdentity(gssi=9002, attach=False,
                                   detach_reason=1),
                  mm.GroupIdentity(gssi=9003, attach=True,
                                   extension=0x123456)]
        out = mm.parse_group_identity_list(
            mm.build_group_identity_list(groups))
        assert [g.gssi for g in out] == [9001, 9002, 9003]
        assert out[0].attach and out[0].class_of_usage == 3
        assert not out[1].attach and out[1].detach_reason == 1
        assert out[2].extension == 0x123456

    def test_through_mm_pdu(self):
        p = mm.DAttachDetachGroupIdentity(group_identity_ack_request=1)
        p.set_groups([mm.GroupIdentity(gssi=7777, lifetime=1)])
        q = mm.parse_mm(p.build())
        assert q.groups[0].gssi == 7777 and q.groups[0].attach


class TestMleProtocol:
    def test_nwrk_broadcast_round_trip(self):
        p = mle.DNwrkBroadcast(
            cell_reselect_parameters=0xABCD, cell_load_ca=2,
            tetra_network_time=0x123456789ABC & ((1 << 48) - 1),
            neighbours=[
                mle.NeighbourCell(cell_identifier=3, main_carrier=3610,
                                  la_flag=1, location_area=77),
                mle.NeighbourCell(cell_identifier=4, main_carrier=3620,
                                  extended_flag=1, frequency_band=4)])
        q = mle.parse_mle_pdu(p.build())
        assert isinstance(q, mle.DNwrkBroadcast)
        assert q.cell_reselect_parameters == 0xABCD
        assert [n.main_carrier for n in q.neighbours] == [3610, 3620]
        assert q.neighbours[0].location_area == 77
        assert q.neighbours[1].frequency_band == 4

    def test_routed_and_confident(self):
        p = mle.DNwrkBroadcast(neighbours=[
            mle.NeighbourCell(main_carrier=3700)])
        tm = mle.wrap_mle(mle.PD.MLE, p.build())
        r = mac.MacResource(address=1, tm_sdu=tm)
        res = layer3.decode_mac_block(r.build(SCHF_BITS))
        assert res[0].confident
        assert "3700" in layer3.describe_pdu(res[0])

    def test_unknown_mle_type_opaque(self):
        bits = np.concatenate([np.asarray([0, 0, 0], np.uint8),
                               np.ones(20, np.uint8)])
        q = mle.parse_mle_pdu(bits)
        assert isinstance(q, mle.MlePdu)
