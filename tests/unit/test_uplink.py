"""Uplink bursts (NUB / CB with SCH/HU): layouts, round trips, and the
isolated-burst monitor — capability beyond the downlink-only reference."""

import numpy as np
import pytest

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
