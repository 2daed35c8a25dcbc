"""AACH (30,14) shortened Reed-Muller code: exhaustive structural pins.

The reference has no AACH layer at all (protocol.py:300 starts at MAC
heuristics); these tests pin the new code's algebra (distance 8,
linearity, systematic encode) and the matmul ML decoder's optimality.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tetraear_tpu.ops import rm3014


class TestCodeStructure:
    def test_generator_shape_and_systematic(self):
        g = rm3014.generator_matrix()
        assert g.shape == (14, 30)
        # systematic: some 14 columns of g form the identity
        eye = np.eye(14, dtype=np.uint8)
        id_cols = []
        for c in range(30):
            col = g[:, c]
            if col.sum() == 1:
                id_cols.append(c)
        picked = g[:, id_cols]
        # every unit vector appears among the weight-1 columns
        present = {tuple(picked[:, i]) for i in range(picked.shape[1])}
        for r in range(14):
            assert tuple(eye[r]) in present

    def test_minimum_distance_exhaustive(self):
        cw = rm3014.codeword_table()
        w = cw.sum(axis=1)
        assert w[0] == 0
        assert int(w[1:].min()) == 8          # shortened RM(2,5) keeps d=8

    def test_linearity(self):
        rng = np.random.default_rng(0)
        a = rng.integers(0, 2, 14).astype(np.uint8)
        b = rng.integers(0, 2, 14).astype(np.uint8)
        assert np.array_equal(rm3014.encode(a ^ b),
                              rm3014.encode(a) ^ rm3014.encode(b))

    def test_table_indexing_matches_encode(self):
        cw = rm3014.codeword_table()
        rng = np.random.default_rng(1)
        for _ in range(20):
            bits = rng.integers(0, 2, 14).astype(np.uint8)
            idx = int("".join(map(str, bits)), 2)
            assert np.array_equal(cw[idx], rm3014.encode(bits))


class TestDecode:
    def test_roundtrip_clean(self):
        rng = np.random.default_rng(2)
        msgs = rng.integers(0, 2, (64, 14)).astype(np.uint8)
        cws = rm3014.encode(msgs)
        llrs = jnp.asarray(cws.astype(np.float32) * 2 - 1)
        bits, margin = rm3014.decode_soft(llrs)
        assert np.array_equal(np.asarray(bits), msgs)
        assert np.all(np.asarray(margin) > 0)

    @pytest.mark.parametrize("nerr", [1, 2, 3])
    def test_corrects_up_to_3_errors(self, nerr):
        rng = np.random.default_rng(nerr)
        for _ in range(32):
            msg = rng.integers(0, 2, 14).astype(np.uint8)
            cw = rm3014.encode(msg)
            pos = rng.choice(30, nerr, replace=False)
            rx = cw.copy()
            rx[pos] ^= 1
            bits, dist = rm3014.decode_hard(rx)
            assert np.array_equal(bits, msg)
            assert dist == nerr

    def test_ml_optimality_vs_bruteforce(self):
        rng = np.random.default_rng(7)
        llrs = rng.normal(size=(8, 30)).astype(np.float32)
        bits, _ = rm3014.decode_soft(jnp.asarray(llrs))
        signs = rm3014.codeword_table().astype(np.float32) * 2 - 1
        for i in range(8):
            want = int(np.argmax(signs @ llrs[i]))
            got = int("".join(map(str, np.asarray(bits)[i])), 2)
            assert got == want

    def test_soft_beats_hard_under_noise(self):
        # erased (zero-LLR) positions: soft ML must still decode exactly
        rng = np.random.default_rng(9)
        msg = rng.integers(0, 2, 14).astype(np.uint8)
        cw = rm3014.encode(msg).astype(np.float32) * 2 - 1
        cw[[3, 11, 17, 24, 29]] = 0.0         # 5 erasures < d_min
        bits, _ = rm3014.decode_soft(jnp.asarray(cw))
        assert np.array_equal(np.asarray(bits), msg)

    def test_batched_shapes(self):
        llrs = jnp.zeros((3, 5, 30), jnp.float32).at[..., 0].set(1.0)
        bits, margin = rm3014.decode_soft(llrs)
        assert bits.shape == (3, 5, 14)
        assert margin.shape == (3, 5)
