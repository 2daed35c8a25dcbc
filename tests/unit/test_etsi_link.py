"""Full TX/RX etsi link-layer tests (transmit -> over-the-air -> sync ->
channel decode -> MAC parse)."""

import numpy as np
import pytest

from tetraear_tpu.models.etsi_link import (EtsiLinkReceiver, build_burst_bits,
                                           transmit)


def _mac_resource(payload: bytes, rng, address=0x0ABC):
    def u(v, n):
        return [(v >> (n - 1 - i)) & 1 for i in range(n)]
    head = [0, 0, 0, 0, 0] + u(address, 24) + u(len(payload), 6)
    bits = head + list(np.unpackbits(np.frombuffer(payload, np.uint8)))
    bits += list(rng.integers(0, 2, 268 - len(bits)))
    return np.array(bits, np.uint8)


class TestBurstFormat:
    def test_burst_layout(self, rng):
        mac = _mac_resource(b"X", rng)
        burst = build_burst_bits(mac)
        assert len(burst) == 22 + 432
        from tetraear_tpu import constants as C
        np.testing.assert_array_equal(burst[:22], C.TS1)


class TestLinkRoundTrip:
    def test_clean_link(self, rng):
        macs = [_mac_resource(f"LINK MSG {i}".encode(), rng)
                for i in range(3)]
        iq = transmit(macs, seed=5)
        frames = EtsiLinkReceiver().receive(iq)
        good = [f for f in frames if f.crc_ok]
        assert len(good) == 3
        for i, f in enumerate(good):
            assert f.mac_pdu is not None
            assert f.mac_pdu.pdu_type.name == "MAC_RESOURCE"
            assert f.mac_pdu.data == f"LINK MSG {i}".encode()
            np.testing.assert_array_equal(f.mac_bits, macs[i])

    def test_noisy_link_12db(self, rng):
        macs = [_mac_resource(f"NOISY {i}".encode(), rng) for i in range(4)]
        iq = transmit(macs, snr_db=12, seed=7)
        frames = EtsiLinkReceiver().receive(iq)
        good = [f for f in frames if f.crc_ok]
        assert len(good) >= 3
        texts = {bytes(f.mac_pdu.data) for f in good if f.mac_pdu}
        assert any(t.startswith(b"NOISY") for t in texts)

    def test_scrambled_link_needs_matching_ecc(self, rng):
        from tetraear_tpu.ops.scramble import extended_colour_code
        ecc = extended_colour_code(260, 98, 5)
        macs = [_mac_resource(b"SCRAMBLED", rng)]
        iq = transmit(macs, ecc30=ecc, seed=9)
        good_rx = EtsiLinkReceiver(ecc30=ecc).receive(iq)
        bad_rx = EtsiLinkReceiver(ecc30=0).receive(iq)
        assert sum(f.crc_ok for f in good_rx) == 1
        assert sum(f.crc_ok for f in bad_rx) == 0

    def test_frequency_offset_corrected(self, rng):
        macs = [_mac_resource(b"OFFSET TEST", rng)]
        iq = transmit(macs, seed=11)
        t = np.arange(len(iq)) / 2.4e6
        iq = (iq * np.exp(2j * np.pi * 1500.0 * t)).astype(np.complex64)
        frames = EtsiLinkReceiver().receive(iq, freq_offset=1500.0)
        assert sum(f.crc_ok for f in frames) == 1

    def test_empty_input(self):
        assert EtsiLinkReceiver().receive(
            np.zeros(1000, np.complex64)) == []
