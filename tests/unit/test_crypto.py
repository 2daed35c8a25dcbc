"""TEA decryption + key management tests (reference crypto.py parity)."""

import pytest

from tetraear_tpu.crypto.keys import (COMMON_KEYS, TetraKeyManager,
                                      parse_user_keys)
from tetraear_tpu.crypto.tea import TEADecryptor


class TestTEA:
    def test_key_length_validation(self):
        TEADecryptor(bytes(10), "TEA1")
        TEADecryptor(bytes(16), "TEA2")
        with pytest.raises(ValueError):
            TEADecryptor(bytes(16), "TEA1")
        with pytest.raises(ValueError):
            TEADecryptor(bytes(10), "TEA2")
        with pytest.raises(ValueError):
            TEADecryptor(bytes(16), "TEA9")

    def test_tea1_known_output(self):
        """Snapshot of the reference Feistel arithmetic — locks the exact
        byte stream the decrypt scorer depends on (crypto.py:88-126)."""
        key = bytes.fromhex("00112233445566778899")
        out = TEADecryptor(key, "TEA1").decrypt_block(bytes(8))
        assert len(out) == 8
        # deterministic: same input -> same output
        assert out == TEADecryptor(key, "TEA1").decrypt_block(bytes(8))
        # different key -> different output
        out2 = TEADecryptor(bytes(10), "TEA1").decrypt_block(bytes(8))
        assert out != out2

    def test_tea2_encrypt_inverse(self):
        """Verify the TEA2 stand-in inverts its encrypt direction.  NOTE the
        reference decrements `sum` *between* the v1/v0 half-rounds
        (crypto.py:156-161) — not standard TEA — so the matching encryptor
        increments between the v0/v1 half-rounds."""
        import struct
        key = bytes.fromhex("0123456789ABCDEF0123456789ABCDEF")
        k0, k1, k2, k3 = struct.unpack(">IIII", key)
        v0, v1 = 0x12345678, 0x9ABCDEF0
        delta, mask = 0x9E3779B9, 0xFFFFFFFF
        s = 0
        for _ in range(32):
            v0 = (v0 + (((v1 << 4) + k0) ^ (v1 + s) ^ ((v1 >> 5) + k1))) & mask
            s += delta
            v1 = (v1 + (((v0 << 4) + k2) ^ (v0 + s) ^ ((v0 >> 5) + k3))) & mask
        ct = struct.pack(">II", v0, v1)
        pt = TEADecryptor(key, "TEA2").decrypt_block(ct)
        assert pt == struct.pack(">II", 0x12345678, 0x9ABCDEF0)

    def test_tea3_tea4_alias_tea2(self):
        key = bytes(16)
        block = bytes(range(8))
        t2 = TEADecryptor(key, "TEA2").decrypt_block(block)
        assert TEADecryptor(key, "TEA3").decrypt_block(block) == t2
        assert TEADecryptor(key, "TEA4").decrypt_block(block) == t2

    def test_ecb_blockwise(self):
        key = bytes(10)
        d = TEADecryptor(key, "TEA1")
        two = d.decrypt(bytes(16))
        assert two == d.decrypt_block(bytes(8)) * 2

    def test_cbc_mode(self):
        key = bytes(10)
        d = TEADecryptor(key, "TEA1")
        iv = bytes(range(8))
        data = bytes(range(16))
        out = d.decrypt(data, iv=iv)
        # first block XORed with IV, second with first ciphertext block
        b0 = bytes(a ^ b for a, b in zip(d.decrypt_block(data[:8]), iv))
        b1 = bytes(a ^ b for a, b in zip(d.decrypt_block(data[8:]), data[:8]))
        assert out == b0 + b1

    def test_bad_lengths(self):
        d = TEADecryptor(bytes(10), "TEA1")
        with pytest.raises(ValueError):
            d.decrypt(bytes(7))
        with pytest.raises(ValueError):
            d.decrypt(bytes(16), iv=bytes(4))


class TestKeys:
    def test_common_key_counts(self):
        """Key tables are behavioral constants (decoder.py:36-98)."""
        assert len(COMMON_KEYS["TEA1"]) == 13
        assert len(COMMON_KEYS["TEA2"]) == 12
        assert len(COMMON_KEYS["TEA3"]) == 2
        assert len(COMMON_KEYS["TEA4"]) == 2
        # the deliberate invalid-length entries survive (quirk)
        assert len(COMMON_KEYS["TEA1"][1]) == 12
        assert len(COMMON_KEYS["TEA2"][7]) == 18

    def test_parse_user_keys(self):
        keys = parse_user_keys(["00112233445566778899",
                                "0123456789ABCDEF0123456789ABCDEF",
                                "AB:CD", "xx"])
        algs = [a for a, _ in keys]
        assert algs == ["TEA1", "TEA2", "TEA3", "TEA4"]

    def test_parse_256bit_key_truncates(self):
        keys = parse_user_keys(["00" * 32])
        assert [a for a, _ in keys] == ["TEA2", "TEA3", "TEA4"]
        assert all(len(k) == 16 for _, k in keys)

    def test_key_manager_file(self, tmp_path):
        f = tmp_path / "keys.txt"
        f.write_text("# comment\n"
                     "TEA1:0:00112233445566778899\n"
                     "TEA2:1:0123456789ABCDEF0123456789ABCDEF\n"
                     "bad line\n")
        km = TetraKeyManager()
        km.load_key_file(str(f))
        assert km.has_key("TEA1", "0")
        assert km.get_key("tea1", "0") == bytes.fromhex("00112233445566778899")
        assert km.has_key("TEA2", "1")
        assert not km.has_key("TEA3")

    def test_key_manager_missing_file(self):
        km = TetraKeyManager()
        with pytest.raises(FileNotFoundError):
            km.load_key_file("/nonexistent/keys.txt")

    def test_add_key(self):
        km = TetraKeyManager()
        km.add_key("TEA1", "5", bytes(10))
        assert km.get_key("TEA1", "5") == bytes(10)


class TestTEAEncryptor:
    """TX direction (new capability — the reference is receive-only)."""

    def test_inverse_all_algorithms_ecb_and_cbc(self):
        import os
        from tetraear_tpu.crypto.tea import TEADecryptor, TEAEncryptor
        rng = __import__("numpy").random.default_rng(0)
        for alg, klen in (("TEA1", 10), ("TEA2", 16), ("TEA3", 16),
                          ("TEA4", 16)):
            for _ in range(4):
                key = bytes(rng.integers(0, 256, klen, dtype="uint8"))
                pt = bytes(rng.integers(0, 256, 24, dtype="uint8"))
                e = TEAEncryptor(key, alg)
                d = TEADecryptor(key, alg)
                assert d.decrypt(e.encrypt(pt)) == pt
                iv = bytes(rng.integers(0, 256, 8, dtype="uint8"))
                assert d.decrypt(e.encrypt(pt, iv=iv), iv=iv) == pt

    def test_matches_manual_tea2_inverse_vector(self):
        # the hand-rolled inverse from TestTEACrypto.test_tea2_encrypt_inverse
        import struct
        from tetraear_tpu.crypto.tea import TEADecryptor, TEAEncryptor
        key = bytes.fromhex("0123456789ABCDEF0123456789ABCDEF")
        pt = struct.pack(">II", 0x12345678, 0x9ABCDEF0)
        ct = TEAEncryptor(key, "TEA2").encrypt_block(pt)
        assert TEADecryptor(key, "TEA2").decrypt_block(ct) == pt

    def test_key_validation_shared(self):
        import pytest as _pytest
        from tetraear_tpu.crypto.tea import TEAEncryptor
        with _pytest.raises(ValueError):
            TEAEncryptor(bytes(9), "TEA1")
        with _pytest.raises(ValueError):
            TEAEncryptor(bytes(10), "TEA9")
