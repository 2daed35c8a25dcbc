"""Native C++ TEA engine: build, parity with the Python implementation,
decoder integration."""

import numpy as np
import pytest

from tetraear_tpu.crypto import native
from tetraear_tpu.crypto.keys import COMMON_KEYS
from tetraear_tpu.crypto.tea import TEADecryptor

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native teacrypt not built")


class TestNativeParity:
    def test_tea1_matches_python(self, rng):
        for _ in range(20):
            key = rng.integers(0, 256, 10).astype(np.uint8).tobytes()
            data = rng.integers(0, 256, 48).astype(np.uint8).tobytes()
            want = TEADecryptor(key, "TEA1").decrypt(data)
            got = native.decrypt_ecb(key, "TEA1", data)
            assert got == want

    def test_tea2_matches_python(self, rng):
        for _ in range(20):
            key = rng.integers(0, 256, 16).astype(np.uint8).tobytes()
            data = rng.integers(0, 256, 64).astype(np.uint8).tobytes()
            want = TEADecryptor(key, "TEA2").decrypt(data)
            got = native.decrypt_ecb(key, "TEA2", data)
            assert got == want
            # TEA3/TEA4 alias TEA2
            assert native.decrypt_ecb(key, "TEA3", data) == want

    def test_bruteforce_batch_matches_sequential(self, rng):
        data = rng.integers(0, 256, 56).astype(np.uint8).tobytes()
        keys = [(k, "TEA1") for k in COMMON_KEYS["TEA1"]] + \
               [(k, "TEA2") for k in COMMON_KEYS["TEA2"][:4]]
        results = native.bruteforce(keys, data)
        assert results is not None and len(results) == len(keys)
        for (key, alg), got in zip(keys, results):
            expected_len = 10 if alg == "TEA1" else 16
            if len(key) != expected_len:
                assert got is None        # invalid-length quirk preserved
            else:
                assert got == TEADecryptor(key, alg).decrypt(data)

    def test_invalid_inputs(self):
        assert native.decrypt_ecb(bytes(10), "TEA1", bytes(7)) is None
        assert native.decrypt_ecb(bytes(9), "TEA1", bytes(8)) is None
        assert native.bruteforce([], bytes(8)) is None


class TestDecoderIntegration:
    def test_decrypt_frame_same_result_with_and_without_native(self, rng):
        """The decoder must produce identical decrypt results whether the
        native engine is loaded or not."""
        from unittest import mock
        from tetraear_tpu.core.decoder import TetraDecoder

        payload = rng.integers(0, 256, 48).astype(np.uint8).tobytes()
        frame = {
            "encryption_algorithm": "TEA1", "number": 0,
            "bits": np.zeros(510, np.int64),
            "mac_pdu": {"data": payload},
        }
        dec = TetraDecoder(auto_decrypt=True)
        with_native = dec._decrypt_frame(dict(frame))
        with mock.patch.object(native, "bruteforce", return_value=None):
            dec2 = TetraDecoder(auto_decrypt=True)
            without = dec2._decrypt_frame(dict(frame))
        for k in ("decrypted", "keys_tried", "best_score", "best_key"):
            assert with_native.get(k) == without.get(k), k
        if with_native.get("decrypted"):
            assert (with_native["decrypted_bytes"]
                    == without["decrypted_bytes"])
