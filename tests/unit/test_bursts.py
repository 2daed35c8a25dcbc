"""ETSI burst field maps, phase adjustment, and broadcast PDU codecs.

Pins the §9.4.4 layout invariants (both midambles at bit 244, NTS3
straddling slot edges, field spans tiling 510 bits), the zero-phase
property of the computed adjustment bits, and PDU round trips.
"""

import numpy as np
import pytest

from tetraear_tpu import constants as C
from tetraear_tpu.protocol import bursts
from tetraear_tpu.protocol.pdus import AccessAssignPDU, SyncPDU, SysinfoPDU


def _rand_bits(rng, n):
    return rng.integers(0, 2, n).astype(np.uint8)


class TestFieldMaps:
    def test_maps_tile_510(self):
        for fields in (bursts.NDB_FIELDS, bursts.SB_FIELDS):
            spans = sorted(fields.values())
            assert spans[0][0] == 0 and spans[-1][1] == 510
            assert all(a[1] == b[0] for a, b in zip(spans, spans[1:]))

    def test_midamble_position_shared(self):
        assert bursts.NDB_FIELDS["nts"][0] == 244
        assert bursts.SB_FIELDS["sts"][0] == 244
        assert bursts.MIDAMBLE_POS == 244

    def test_training_sequence_lengths(self):
        assert bursts.NTS1.size == 22 and bursts.NTS2.size == 22
        assert bursts.NTS3.size == 22
        assert bursts.ETS.size == 30 and bursts.STS.size == 38
        assert np.array_equal(bursts.NTS1, C.TS1)
        assert np.array_equal(bursts.NTS2, C.TS2)

    def test_freq_correction_pattern(self):
        fc = bursts.FREQ_CORRECTION
        assert fc.size == 80
        assert np.all(fc[:8] == 1) and np.all(fc[-8:] == 1)
        assert np.all(fc[8:72] == 0)


class TestBuildSlice:
    def test_ndb_round_trip(self):
        rng = np.random.default_rng(0)
        bkn1, bkn2 = _rand_bits(rng, 216), _rand_bits(rng, 216)
        bb = _rand_bits(rng, 30)
        b = bursts.build_ndb(bkn1, bb, bkn2, training=1)
        assert b.size == 510
        s = bursts.slice_burst(b)
        assert s.kind == "NDB"
        assert np.array_equal(s.fields["bkn1"], bkn1)
        assert np.array_equal(s.fields["bkn2"], bkn2)
        assert np.array_equal(bursts.ndb_aach_bits(s), bb)
        assert np.array_equal(s.fields["nts"], bursts.NTS1)

    def test_sb_round_trip(self):
        rng = np.random.default_rng(1)
        sb1 = _rand_bits(rng, 120)
        bb = _rand_bits(rng, 30)
        bkn2 = _rand_bits(rng, 216)
        b = bursts.build_sb(sb1, bb, bkn2)
        s = bursts.slice_burst(b)
        assert s.kind == "SB"
        assert np.array_equal(s.fields["sb1"], sb1)
        assert np.array_equal(s.fields["bb"], bb)
        assert np.array_equal(s.fields["bkn2"], bkn2)
        assert np.array_equal(s.fields["fc"], bursts.FREQ_CORRECTION)
        assert np.array_equal(s.fields["sts"], bursts.STS)

    def test_nts3_straddles_slot_boundary(self):
        rng = np.random.default_rng(2)
        b1 = bursts.build_ndb(_rand_bits(rng, 216), _rand_bits(rng, 30),
                              _rand_bits(rng, 216))
        b2 = bursts.build_sb(_rand_bits(rng, 120), _rand_bits(rng, 30),
                             _rand_bits(rng, 216))
        # q1..q10 at the end of one burst + q11..q22 at the start of the next
        joined = np.concatenate([b1[-10:], b2[:12]])
        assert np.array_equal(joined, bursts.NTS3)

    def test_classify_under_bit_errors(self):
        rng = np.random.default_rng(3)
        sb = bursts.build_sb(_rand_bits(rng, 120), _rand_bits(rng, 30),
                             _rand_bits(rng, 216))
        ndb = bursts.build_ndb(_rand_bits(rng, 216), _rand_bits(rng, 30),
                               _rand_bits(rng, 216), training=2)
        for b, kind in ((sb, "SB"), (ndb, "NDB")):
            noisy = b.copy()
            pos = rng.choice(510, 15, replace=False)
            noisy[pos] ^= 1
            assert bursts.classify_burst(noisy) == kind


class TestPhaseAdjustment:
    @pytest.mark.parametrize("seed", range(5))
    def test_exact_cancellation_on_odd_spans(self, seed):
        rng = np.random.default_rng(seed)
        span = _rand_bits(rng, 230)      # 115 dibits, odd
        pa = bursts.phase_adjustment_bits(span)
        total = bursts._phase8(np.concatenate([pa, span]))
        assert total == 0

    def test_ndb_pins_phase_at_midamble_and_slot_end(self, ):
        rng = np.random.default_rng(11)
        b = bursts.build_ndb(_rand_bits(rng, 216), _rand_bits(rng, 30),
                             _rand_bits(rng, 216))
        # phase from bit 12 (pa) to midamble == 0
        assert bursts._phase8(b[12:244]) == 0
        # phase of bkn2 + pa + q_head == 0
        assert bursts._phase8(b[282:510]) == 0

    def test_sb_pins_phase(self):
        rng = np.random.default_rng(12)
        b = bursts.build_sb(_rand_bits(rng, 120), _rand_bits(rng, 30),
                            _rand_bits(rng, 216))
        assert bursts._phase8(b[12:244]) == 0
        assert bursts._phase8(b[282:510]) == 0


class TestPDUs:
    def test_sync_pdu_round_trip(self):
        p = SyncPDU(system_code=0, colour_code=17, timeslot=0,
                    frame_number=7, multiframe_number=42, mcc=262, mnc=1234,
                    cell_service_level=2, late_entry_info=1)
        bits = p.build()
        assert bits.size == 60
        assert SyncPDU.parse(bits) == p

    def test_sync_pdu_width_sum(self):
        assert sum(SyncPDU.WIDTHS) == 60
        assert sum(SysinfoPDU.WIDTHS) == 124

    def test_sysinfo_round_trip(self):
        p = SysinfoPDU(main_carrier=2235, frequency_band=3, offset=1,
                       ms_txpwr_max_cell=5, rxlev_access_min=9,
                       access_parameter=12, radio_downlink_timeout=4,
                       hyperframe_number=0x1234, frame_bitmap=0xABCDE,
                       location_area=999, subscriber_class=0x8001,
                       bs_service_details=0x7FF)
        bits = p.build()
        assert bits.size == 124
        assert SysinfoPDU.parse(bits) == p

    def test_sysinfo_frequency(self):
        p = SysinfoPDU(main_carrier=3600, frequency_band=3, offset=2)
        # 300 MHz + 3600*25 kHz - 6.25 kHz = 389.99375 MHz
        assert p.downlink_frequency_hz == pytest.approx(389_993_750.0)

    def test_access_assign_round_trip(self):
        p = AccessAssignPDU(header=3, field1=0x2A, field2=0x15)
        bits = p.build()
        assert bits.size == 14
        q = AccessAssignPDU.parse(bits)
        assert q == p
        assert q.downlink_usage == "traffic"

    def test_truncation_masks_overflow(self):
        p = AccessAssignPDU(header=7, field1=200, field2=0)
        q = AccessAssignPDU.parse(p.build())
        assert q.header == 3 and q.field1 == 200 & 0x3F
