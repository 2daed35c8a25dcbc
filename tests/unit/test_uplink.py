"""Uplink bursts (NUB / CB with SCH/HU): layouts, round trips, and the
isolated-burst monitor — capability beyond the downlink-only reference."""

import numpy as np
import pytest

from tetraear_tpu.models import uplink
from tetraear_tpu.models.uplink import UplinkMonitor, UplinkTransmitter
from tetraear_tpu.ops import channel_coding as cc
from tetraear_tpu.ops.scramble import extended_colour_code
from tetraear_tpu.protocol import bursts
from tetraear_tpu.utils.synth import make_mac_block_bits

ECC = extended_colour_code(262, 1001, 17)


def _mac92(payload: bytes, seed=0):
    return make_mac_block_bits(payload, total_bits=92, seed=seed)


class TestLayouts:
    def test_field_maps_tile(self):
        assert sorted(bursts.NUB_FIELDS.values())[-1][1] == 462
        assert sorted(bursts.CB_FIELDS.values())[-1][1] == 206

    def test_schhu_geometry(self):
        assert cc.CHANNEL_GEOMETRY["SCH/HU"] == (92, 168)
        rng = np.random.default_rng(0)
        bits = rng.integers(0, 2, 92).astype(np.uint8)
        coded = cc.encode_channel(bits, "SCH/HU", ecc30=ECC)
        assert coded.shape == (168,)
        import jax.numpy as jnp
        dec = cc.decode_channel_soft(
            jnp.asarray(coded.astype(np.float32) * 2 - 1), "SCH/HU",
            ecc30=ECC)
        assert bool(dec.crc_ok)
        np.testing.assert_array_equal(np.asarray(dec.bits), bits)

    def test_build_slice_round_trip(self):
        rng = np.random.default_rng(1)
        b1, b2 = (rng.integers(0, 2, 216).astype(np.uint8) for _ in "ab")
        nub = bursts.build_nub(b1, b2, training=2)
        s = bursts.slice_nub(nub)
        np.testing.assert_array_equal(s["bkn1"], b1)
        np.testing.assert_array_equal(s["bkn2"], b2)
        np.testing.assert_array_equal(s["nts"], bursts.NTS2)

        coded = rng.integers(0, 2, 168).astype(np.uint8)
        cb = bursts.build_cb(coded)
        sc = bursts.slice_cb(cb)
        np.testing.assert_array_equal(
            np.concatenate([sc["cb1"], sc["cb2"]]), coded)
        np.testing.assert_array_equal(sc["ets"], bursts.ETS)


class TestMonitor:
    def test_bit_level_nub_and_cb(self):
        tx = UplinkTransmitter(ECC)
        rng = np.random.default_rng(2)
        nub = tx.nub_bits(make_mac_block_bits(b"UPLINK SDS", seed=3))
        cb = tx.cb_bits(_mac92(b"SHORT", seed=4))
        stream = np.concatenate([
            rng.integers(0, 2, 97).astype(np.uint8), nub,
            rng.integers(0, 2, 151).astype(np.uint8), cb,
            rng.integers(0, 2, 80).astype(np.uint8)])
        frames = UplinkMonitor(ECC).receive_bits(stream)
        kinds = [(f.kind, f.channel) for f in frames]
        assert ("NUB", "SCH/F") in kinds and ("CB", "SCH/HU") in kinds
        by_kind = {f.kind: f for f in frames}
        assert bytes(by_kind["NUB"].mac_pdu.data) == b"UPLINK SDS"
        assert bytes(by_kind["CB"].mac_pdu.data) == b"SHORT"
        assert by_kind["NUB"].start_bit == 97
        assert by_kind["CB"].start_bit == 97 + 462 + 151

    def test_wrong_cell_scrambling_rejected(self):
        tx = UplinkTransmitter(ECC)
        nub = tx.nub_bits(make_mac_block_bits(b"WRONG CELL"))
        rng = np.random.default_rng(5)
        stream = np.concatenate([rng.integers(0, 2, 64).astype(np.uint8),
                                 nub,
                                 rng.integers(0, 2, 64).astype(np.uint8)])
        other = extended_colour_code(262, 9, 1)
        assert UplinkMonitor(other).receive_bits(stream) == []

    def test_over_the_air(self):
        tx = UplinkTransmitter(ECC)
        bursts_tx = [tx.nub_bits(make_mac_block_bits(b"AIR UPLINK 1",
                                                     seed=6)),
                     tx.cb_bits(_mac92(b"AIR CB", seed=7)),
                     tx.nub_bits(make_mac_block_bits(b"AIR UPLINK 2",
                                                     seed=8))]
        iq = tx.transmit(bursts_tx, snr_db=22, seed=9)
        frames = UplinkMonitor(ECC).receive(iq)
        datas = {bytes(f.mac_pdu.data) for f in frames if f.mac_pdu}
        assert b"AIR UPLINK 1" in datas
        assert b"AIR UPLINK 2" in datas
        assert b"AIR CB" in datas

    def test_noise_only_is_silent(self):
        rng = np.random.default_rng(10)
        noise = (rng.standard_normal(150_000)
                 + 1j * rng.standard_normal(150_000)).astype(np.complex64)
        assert UplinkMonitor(ECC).receive(noise) == []


class TestUplinkLayer3:
    """True uplink layer 3 (MAC-ACCESS/MAC-DATA -> MLE -> U-* CMCE),
    the structured alternative to the heuristic parse above."""

    def test_u_sds_via_control_burst(self):
        from tetraear_tpu.protocol import cmce, sds_tl
        tx = UplinkTransmitter(ECC)
        # SCH/HU fits ~10 octets of PDU: short status-length text via
        # the fixed-width user-defined short data instead of SDS-TL
        pdu = cmce.USdsData(called_party=cmce.Address(0, 0x2A),
                            short_data_type=0, user_data=0xCAFE)
        rng = np.random.default_rng(5)
        stream = np.concatenate([
            rng.integers(0, 2, 80).astype(np.uint8),
            tx.access_cb(pdu, ssi=0xABCD),
            rng.integers(0, 2, 80).astype(np.uint8)])
        frames = UplinkMonitor(ECC).receive_bits(stream)
        hit = [f for f in frames if f.layer3]
        assert hit
        r = hit[0].layer3[0]
        assert r.name == "USdsData"
        assert r.pdu.user_data == 0xCAFE
        assert r.pdu.called_party.ssi == 0x2A
        assert r.mac_pdu.address == 0xABCD

    def test_u_setup_and_sds_tl_text_via_nub(self):
        from tetraear_tpu.protocol import cmce, sds_tl
        tx = UplinkTransmitter(ECC)
        setup = cmce.USetup(basic_service_info=0,
                            called_party=cmce.Address(1, 0x2328),
                            call_priority=5)
        sds = cmce.USdsData(called_party=cmce.Address(1, 0x2328),
                            short_data_type=3,
                            data_bits=sds_tl.build_text_transfer(
                                "uplink report 7"))
        rng = np.random.default_rng(6)
        stream = np.concatenate([
            rng.integers(0, 2, 64).astype(np.uint8),
            tx.signalling_nub(setup, ssi=0x777),
            rng.integers(0, 2, 64).astype(np.uint8),
            tx.signalling_nub(sds, ssi=0x777),
            rng.integers(0, 2, 64).astype(np.uint8)])
        frames = [f for f in UplinkMonitor(ECC).receive_bits(stream)
                  if f.layer3]
        names = [f.layer3[0].name for f in frames]
        assert names == ["USetup", "USdsData"]
        assert frames[0].layer3[0].pdu.called_party.ssi == 0x2328
        assert frames[1].sds_message == "uplink report 7"

    def test_heuristic_fallback_preserved(self):
        tx = UplinkTransmitter(ECC)
        rng = np.random.default_rng(7)
        stream = np.concatenate([
            rng.integers(0, 2, 80).astype(np.uint8),
            tx.nub_bits(make_mac_block_bits(b"LEGACY UPLINK", seed=8)),
            rng.integers(0, 2, 80).astype(np.uint8)])
        frames = UplinkMonitor(ECC).receive_bits(stream)
        hit = [f for f in frames if f.mac_pdu is not None]
        assert hit and bytes(hit[0].mac_pdu.data) == b"LEGACY UPLINK"
        assert hit[0].layer3 is None


class TestSlotMonitor:
    """UplinkSlotMonitor: slot-synchronous decode on the downlink-slaved
    TDMA grid, with timing recovery and (TN, FN, MN) attribution."""

    def _make(self, ecc=0):
        from tetraear_tpu.protocol import cmce, mle
        from tetraear_tpu.protocol import mac as mac_l2
        from tetraear_tpu.ops import channel_coding as cc
        tx = uplink.UplinkTransmitter(ecc)
        slot_map = {}
        for k, ssi in ((1, 100), (3, 101), (6, 102), (9, 103)):
            pdu = cmce.UStatus(called_party=cmce.Address(1, 9000),
                               precoded_status=k)
            slot_map[k] = tx.signalling_nub(pdu, ssi)
        return tx, slot_map

    def test_decodes_every_active_slot_with_tdma_labels(self):
        tx, slot_map = self._make()
        num_slots = 12
        bits = tx.slot_stream_bits(slot_map, num_slots, lead_bits=137,
                                   seed=5)
        mon = uplink.UplinkSlotMonitor(anchor=(2, 7, 30))
        frames = mon.receive_bits(bits)
        got = {f.slot_index for f in frames}
        assert got == set(slot_map), got
        assert mon.grid_phase == 137
        from tetraear_tpu.models.downlink import advance_tdma
        for f in frames:
            assert (f.tn, f.fn, f.mn) == advance_tdma(2, 7, 30,
                                                      f.slot_index)
            assert f.crc_ok and f.channel == "SCH/F"
            assert f.timing_offset == 0

    def test_timing_recovery_tracks_clock_drift(self):
        """A 2-bit timebase slip mid-stream must not lose lock: the
        per-burst refinement absorbs it and reports the residual."""
        tx, slot_map = self._make()
        bits = tx.slot_stream_bits(slot_map, 12, lead_bits=64, seed=6)
        # slip the MS clock by +2 bits after slot 4 (insert filler bits)
        cut = 64 + 5 * 510
        rng = np.random.default_rng(0)
        slipped = np.concatenate([bits[:cut],
                                  rng.integers(0, 2, 2).astype(np.uint8),
                                  bits[cut:]])
        mon = uplink.UplinkSlotMonitor()
        frames = mon.receive_bits(slipped)
        got = {f.slot_index for f in frames}
        assert got == set(slot_map), got
        late = [f for f in frames if f.slot_index >= 6]
        assert late and any(f.timing_offset == 2 for f in late)
        # after the first corrected burst the drift is absorbed
        assert late[-1].timing_offset in (0, 2)

    def test_cb_half_slots_found_on_grid(self):
        from tetraear_tpu.protocol import cmce
        tx = uplink.UplinkTransmitter(0)
        pdu = cmce.USdsData(called_party=cmce.Address(0, 0x2A),
                            short_data_type=0, user_data=0xCAFE)
        cb = tx.access_cb(pdu, ssi=55)
        # CB in the first half of slot 2, another in the SECOND half of 5
        slot_map = {2: cb}
        bits = tx.slot_stream_bits(slot_map, 8, lead_bits=0, seed=7)
        second_half = np.concatenate(
            [np.random.default_rng(1).integers(0, 2, 255).astype(np.uint8),
             cb])[:510]
        bits = np.concatenate([bits[:5 * 510], second_half[:510],
                               bits[6 * 510:]])
        mon = uplink.UplinkSlotMonitor()
        frames = mon.receive_bits(bits)
        by_slot = {f.slot_index: f for f in frames}
        assert 2 in by_slot and by_slot[2].kind == "CB"
        assert 5 in by_slot and by_slot[5].kind == "CB"

    def test_idle_stream_produces_nothing(self):
        tx = uplink.UplinkTransmitter(0)
        bits = tx.slot_stream_bits({}, 10, seed=9)
        assert uplink.UplinkSlotMonitor().receive_bits(bits) == []


class TestSlotMonitorTraffic:
    def test_uplink_tch_s_voice_on_allocated_tn(self):
        """NUBs on a traffic-allocated TN decode as TCH/S voice blocks
        (the downlink D-SETUP channel-allocation story, uplink side)."""
        rng = np.random.default_rng(4)
        voc = rng.integers(0, 2, (2, 432)).astype(np.uint8)
        tx = uplink.UplinkTransmitter(0)
        t5 = cc.encode_tch(voc, "TCH/S", ecc30=0)
        # anchor (1,1,1): slot k has TN = (k % 4) + 1 -> TN3 = slots 2, 6
        slot_map = {2: tx.traffic_nub(t5[0]), 6: tx.traffic_nub(t5[1])}
        bits = tx.slot_stream_bits(slot_map, 8, lead_bits=40, seed=3)
        mon = uplink.UplinkSlotMonitor(traffic_tns={3: "TCH/S"})
        frames = mon.receive_bits(bits)
        voice = [f for f in frames if f.voice_block is not None]
        assert len(voice) == 2
        idx = np.r_[1:115, 116:230, 231:345, 346:436]
        for i, f in enumerate(voice):
            assert f.tn == 3 and f.channel == "TCH/S" and f.crc_ok is None
            blk = np.frombuffer(f.voice_block, np.int16)
            np.testing.assert_array_equal(
                (blk[idx] > 0).astype(np.uint8), voc[i])
