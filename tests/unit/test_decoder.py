"""Decoder orchestration tests: sync cascade parity (fuzzed vs a loop
oracle), frame decode schema, strict discard, decrypt plumbing."""

import numpy as np
import pytest

from tetraear_tpu import constants as C
from tetraear_tpu.core.decoder import TetraDecoder
from tetraear_tpu.crypto.keys import TetraKeyManager
from tetraear_tpu.utils import synth


# ---------------------------------------------------------------------------
# Loop oracle: a literal transcription of the reference find_sync semantics
# (decoder.py:171-295) for fuzz parity checks.
# ---------------------------------------------------------------------------

def oracle_find_sync(bits, threshold):
    patterns = [np.asarray(C.TS1), np.asarray(C.TS2)]
    sync_positions = []
    n = len(bits)
    if n < 22:
        return sync_positions, 0.0
    num_windows = n - 22 + 1
    i = 0
    max_corr = 0.0
    all_corr = []
    while i < num_windows:
        pos = i
        found = False
        best_at_pos = 0.0
        for pat in patterns:
            corr = np.sum(bits[pos:pos + 22] == pat) / 22
            best_at_pos = max(best_at_pos, corr)
            max_corr = max(max_corr, corr)
            if corr >= threshold:
                sync_positions.append(pos)
                found = True
                break
        if best_at_pos > 0:
            all_corr.append((pos, best_at_pos))
        if found:
            i = pos + 250
            continue
        i += 1
    if not sync_positions and max_corr > 0.75 and max_corr >= threshold - 0.15:
        at = max(0.75, max_corr - 0.02)
        if at < threshold:
            sync_positions = []
            seen = set()
            for pos, corr in all_corr:
                if corr >= at and pos not in seen:
                    sync_positions.append(pos)
                    seen.add(pos)
                    for nearby in range(max(0, pos - 250),
                                        min(num_windows, pos + 250)):
                        seen.add(nearby)
    return sync_positions, max_corr


class TestFindSyncParity:
    @pytest.mark.parametrize("threshold", [0.90, 0.85, 0.80])
    def test_fuzz_random_streams(self, threshold):
        dec = TetraDecoder(auto_decrypt=False)
        for seed in range(12):
            rng = np.random.default_rng(seed)
            bits = rng.integers(0, 2, 1500).astype(np.int64)
            if seed % 3 == 0:  # plant clean syncs
                bits[100:122] = C.TS1
                bits[700:722] = C.TS2
            if seed % 3 == 1:  # plant a near-miss (adaptive territory)
                noisy = C.TS1.copy()
                noisy[[2, 9, 17]] ^= 1
                bits[400:422] = noisy
            got_pos, got_max = dec.find_sync(bits, threshold,
                                             return_max_corr=True)
            want_pos, want_max = oracle_find_sync(bits, threshold)
            assert got_pos == want_pos, f"seed={seed} thr={threshold}"
            # device corr is f32; 1/22-grid values stay far from thresholds
            assert abs(got_max - want_max) < 1e-6, f"seed={seed}"

    def test_short_input(self):
        dec = TetraDecoder(auto_decrypt=False)
        assert dec.find_sync(np.zeros(10, np.int64)) == []
        pos, mc = dec.find_sync(np.zeros(10, np.int64), return_max_corr=True)
        assert pos == [] and mc == 0.0


class TestSymbolsToBits:
    def test_dqpsk_passthrough(self):
        dec = TetraDecoder(auto_decrypt=False)
        bits, mapped = dec.symbols_to_bits(np.array([0, 1, 2, 3]))
        np.testing.assert_array_equal(mapped, [0, 1, 2, 3])
        np.testing.assert_array_equal(bits, [0, 0, 0, 1, 1, 0, 1, 1])

    def test_8psk_fold(self):
        dec = TetraDecoder(auto_decrypt=False)
        _, mapped = dec.symbols_to_bits(np.array([0, 1, 2, 3, 4, 5, 6, 7]))
        np.testing.assert_array_equal(mapped, [0, 0, 0, 1, 1, 3, 2, 2])

    def test_empty(self):
        dec = TetraDecoder(auto_decrypt=False)
        bits, mapped = dec.symbols_to_bits(np.array([]))
        assert bits.size == 0 and mapped.size == 0


class TestDecode:
    def test_planted_golden_frames_decode(self):
        """CRC-valid MAC-RESOURCE slots with TS1 at lead+216+k*510 survive
        the full decode path with crc_ok and parsed payload."""
        stream = synth.make_stream_bits(num_frames=3, lead_bits=64, seed=2,
                                        golden=True)
        symbols = synth.bits_to_symbols(stream)
        dec = TetraDecoder(auto_decrypt=False)
        frames = dec.decode(symbols)
        assert len(frames) == 3
        f = frames[0]
        assert f["burst_crc"] is True
        assert f["type_name"] == "MAC-RESOURCE"
        assert f["mac_pdu"]["data"] == b"HELLO HELLO"
        assert f["mac_pdu"]["address"] == 0x1234
        assert not f["encrypted"]
        # reference frame-dict schema (decoder.py:960-972)
        for key in ("type", "type_name", "number", "timeslot", "bits",
                    "header", "position", "encrypted",
                    "encryption_algorithm", "key_id", "additional_info"):
            assert key in f, key
        assert f["position"] == 0          # quirk: live path passes 0
        assert len(f["bits"]) == 510
        assert len(f["header"]) == 32
        assert f["timeslot"] == f["number"] % 4

    def test_decode_empty(self):
        dec = TetraDecoder(auto_decrypt=False)
        assert dec.decode(np.array([], dtype=np.uint8)) == []

    def test_decode_noise_mostly_rejected(self):
        rng = np.random.default_rng(5)
        symbols = rng.integers(0, 4, 4000)
        dec = TetraDecoder(auto_decrypt=False)
        frames = dec.decode(symbols)
        # random symbols should produce few-to-no frames
        assert len(frames) <= 4

    def test_decode_frame_too_short(self):
        dec = TetraDecoder(auto_decrypt=False)
        assert dec.decode_frame(np.zeros(100, np.int64), 0) is None


class TestDecrypt:
    def _encrypted_frame_bits(self, seed=0):
        """510-bit frame whose header claims encryption mode 1 (TEA1)."""
        rng = np.random.default_rng(seed)
        bits = rng.integers(0, 2, 510).astype(np.int64)
        bits[0:2] = [0, 0]      # MAC-RESOURCE
        bits[2:4] = [0, 1]      # encryption mode 1
        return bits

    def test_decrypt_attempted_fields(self):
        dec = TetraDecoder(auto_decrypt=True)
        frame = dec.decode_frame(self._encrypted_frame_bits(), 0)
        if frame is None:
            pytest.skip("frame discarded by strict CRC gate for this seed")
        if frame.get("encrypted") or frame.get("bypass_clear"):
            assert frame.get("decryption_attempted")
            assert frame.get("keys_tried", 0) > 0

    def test_auto_decrypt_off_skips(self):
        dec = TetraDecoder(auto_decrypt=False)
        frame = dec.decode_frame(self._encrypted_frame_bits(), 0)
        if frame is not None:
            assert "keys_tried" not in frame or frame.get("keys_tried") == 0

    def test_key_order(self):
        """User primary keys come first, then file key, commons, BYPASS,
        cross keys (decoder.py:631-666)."""
        km = TetraKeyManager()
        km.add_key("TEA1", "0", bytes(10))
        dec = TetraDecoder(key_manager=km, auto_decrypt=True)
        dec.set_keys(["00112233445566778899"])   # TEA1 user key
        captured = []
        orig_score = dec._score_decrypt

        def spy(payload):
            return orig_score(payload)
        frame_data = {
            "encryption_algorithm": "TEA1", "key_id": "0", "number": 0,
            "bits": np.zeros(510, np.int64),
            "mac_pdu": {"data": bytes(range(48))},
        }
        out = dec._decrypt_frame(dict(frame_data))
        assert out["decryption_attempted"]
        # 1 user + 1 file + 13 commons + 1 bypass + 0 cross-user + 5+2+2 cross
        assert out["keys_tried"] == 1 + 1 + 13 + 1 + (5 + 2 + 2)

    def test_payload_too_short(self):
        dec = TetraDecoder(auto_decrypt=True)
        out = dec._decrypt_frame({
            "encryption_algorithm": "TEA1", "number": 0,
            "bits": np.zeros(510, np.int64),
            "mac_pdu": {"data": b"ab"},
        })
        assert out["decrypted"] is False
        assert out["decryption_error"] == "Payload too short for decryption"

    def test_common_key_early_break_quirk(self):
        """Documented reference behavior: common keys are tried *before*
        BYPASS, and garbage Feistel output routinely scores > 80 (the GSM7
        last-resort decodes almost any bytes), so a clear payload marked
        encrypted usually 'decrypts' with the first common key instead of
        reaching BYPASS (decoder.py:650-666 ordering + :777 early break)."""
        dec = TetraDecoder(auto_decrypt=True)
        payload = b"\x82" + b"This is a readable clear message!"
        out = dec._decrypt_frame({
            "encryption_algorithm": "TEA1", "number": 1,
            "bits": np.zeros(510, np.int64),
            "mac_pdu": {"data": payload},
        })
        assert out.get("decrypted") is True
        assert "common_key_0" in out["key_used"]
        assert out["decrypt_confidence"] > 80

    def test_bypass_position_in_key_order(self):
        """BYPASS sits after the primary-algorithm commons and before the
        cross-algorithm keys; if every earlier candidate errors out (no
        payload mutation possible on an all-identical stream that scores
        <= 80), BYPASS can still be selected.  Here we just pin its
        presence and label."""
        dec = TetraDecoder(auto_decrypt=True)
        out = dec._decrypt_frame({
            "encryption_algorithm": "TEA9",  # unknown alg: no commons match
            "number": 1,
            "bits": np.zeros(510, np.int64),
            "mac_pdu": {"data": b"\x82" + b"Readable clear text payload!!!"},
        })
        # only BYPASS was available (unknown algorithm has no common keys,
        # TEADecryptor raises for it on cross-try... cross-tries of other
        # algs still run) — accept either BYPASS win or a cross-try win,
        # but keys_tried must include the BYPASS slot
        assert out["keys_tried"] >= 1
        assert out.get("bypass_clear") or out.get("decrypted") is not None

    def test_roundtrip_real_key_decrypt(self):
        """Encrypt a plausible SDS payload with the TEA1 stand-in's inverse
        and confirm the brute-force recovers it with a common key."""
        import struct
        from tetraear_tpu.crypto.tea import TEADecryptor, _DELTA, _MASK
        key = bytes.fromhex("0123456789ABCDEF0123")  # common_key_2

        def tea1_encrypt_block(block):
            # inverse of the reference half-round order: v0 with current s,
            # increment s, v1 with new s (see crypto.py:119-124)
            kw = [struct.unpack(">H", key[i:i + 2])[0] for i in range(0, 10, 2)]
            v0, v1 = struct.unpack(">II", block)
            s = 0
            for _ in range(32):
                v0 = (v0 + ((((v1 << 4) ^ (v1 >> 5) ^ s) + v1)
                            ^ (kw[s & 3] + s))) & _MASK
                s += _DELTA
                v1 = (v1 + ((((v0 << 4) ^ (v0 >> 5) ^ s) + v0)
                            ^ (kw[(s >> 11) & 3] + s))) & _MASK
            return struct.pack(">II", v0, v1)

        plain = b"\x82" + b"SECRET MESSAGE FROM HQ!".ljust(31, b" ")
        assert len(plain) % 8 == 0
        cipher = b"".join(tea1_encrypt_block(plain[i:i + 8])
                          for i in range(0, len(plain), 8))
        # sanity: our decryptor inverts the encryptor
        dec_block = TEADecryptor(key, "TEA1").decrypt(cipher)
        assert dec_block == plain

        dec = TetraDecoder(auto_decrypt=True)
        out = dec._decrypt_frame({
            "encryption_algorithm": "TEA1", "number": 2,
            "bits": np.zeros(510, np.int64),
            "mac_pdu": {"data": cipher},
        })
        assert out.get("decrypted") is True
        # Documented reference quirk: the scorer's early break (>80) fires on
        # the FIRST common key whose garbage output decodes as GSM7 text, so
        # the true key (common_key_2) is never reached — wrong-key output
        # outranks the real plaintext.  Faithful to decoder.py:770-779.
        assert "common_key_0" in out["key_used"]
        assert out["decrypt_confidence"] > 80

    def test_user_key_tried_first_recovers_plaintext(self):
        """When the true key is supplied as a user key it is tried before
        the common keys and its (high-scoring) plaintext wins."""
        import struct
        from tetraear_tpu.crypto.tea import TEADecryptor, _DELTA, _MASK
        key = bytes.fromhex("00998877665544332211")

        def enc_block(block):
            kw = [struct.unpack(">H", key[i:i + 2])[0] for i in range(0, 10, 2)]
            v0, v1 = struct.unpack(">II", block)
            s = 0
            for _ in range(32):
                v0 = (v0 + ((((v1 << 4) ^ (v1 >> 5) ^ s) + v1)
                            ^ (kw[s & 3] + s))) & _MASK
                s += _DELTA
                v1 = (v1 + ((((v0 << 4) ^ (v0 >> 5) ^ s) + v0)
                            ^ (kw[(s >> 11) & 3] + s))) & _MASK
            return struct.pack(">II", v0, v1)

        plain = b"\x82" + b"SECRET MESSAGE FROM HQ!".ljust(31, b" ")
        cipher = b"".join(enc_block(plain[i:i + 8])
                          for i in range(0, len(plain), 8))
        dec = TetraDecoder(auto_decrypt=True)
        dec.set_keys([key.hex()])
        out = dec._decrypt_frame({
            "encryption_algorithm": "TEA1", "number": 3,
            "bits": np.zeros(510, np.int64),
            "mac_pdu": {"data": cipher},
        })
        assert out.get("decrypted") is True
        assert "user_key_0" in out["key_used"]
        assert bytes.fromhex(out["decrypted_bytes"]) == plain
