"""TETRA RCPC convolutional coding: rate-1/4 K=5 mother code, puncturing,
and a batched 16-state Viterbi decoder as a `lax.scan`.

ETSI EN 300 392-2 §8.2.3: mother code generator polynomials

    G1 = 1 + D + D^4
    G2 = 1 + D^2 + D^3 + D^4
    G3 = 1 + D + D^2 + D^3 + D^4
    G4 = 1 + D + D^3 + D^4

Puncturing to rate 2/3 (all control channels: BSCH/SCH-HD/SCH-F/BNCH/STCH):
period t=3, puncturing vector P=(1,2,5) over each 8-bit mother block
(two input steps).  The decoder runs add-compare-select over (batch, 16)
path metrics with stored decisions and a reverse-scan traceback; punctured
positions enter as zero-LLR erasures.

The reference performs no channel decoding at all (protocol.py:300); this
module is the `etsi` profile's real PHY.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

# tap masks over [u(k), u(k-1), u(k-2), u(k-3), u(k-4)]
_GENS = ((1, 1, 0, 0, 1),
         (1, 0, 1, 1, 1),
         (1, 1, 1, 1, 1),
         (1, 1, 0, 1, 1))
NUM_STATES = 16
RATE_DEN = 4

# rate-2/3 puncturing: of each 8 serialized mother bits keep indices {0,1,4}
PUNCTURE_2_3 = {"period_in": 2, "keep": (0, 1, 4)}


@functools.lru_cache(maxsize=None)
def _tables():
    """(next_state[s,u], out_bits[s,u,4]) transition tables."""
    nxt = np.zeros((NUM_STATES, 2), np.int32)
    out = np.zeros((NUM_STATES, 2, RATE_DEN), np.int8)
    for s in range(NUM_STATES):
        # state bits: s = u(k-1)<<3 | u(k-2)<<2 | u(k-3)<<1 | u(k-4)
        hist = [(s >> 3) & 1, (s >> 2) & 1, (s >> 1) & 1, s & 1]
        for u in (0, 1):
            window = [u] + hist
            for g, taps in enumerate(_GENS):
                out[s, u, g] = sum(w & t for w, t in zip(window, taps)) & 1
            nxt[s, u] = (u << 3) | (s >> 1)
    return nxt, out


def conv_encode(bits: np.ndarray, terminate: bool = True) -> np.ndarray:
    """Mother-code encode (host oracle / test-vector generator).

    bits: (N,) -> (4*(N [+4]),) serialized v1..v4 per step; `terminate`
    appends 4 zero tail bits driving the trellis back to state 0."""
    nxt, out = _tables()
    seq = list(np.asarray(bits).astype(int) & 1)
    if terminate:
        seq += [0, 0, 0, 0]
    s = 0
    coded = []
    for u in seq:
        coded.extend(out[s, u])
        s = nxt[s, u]
    return np.asarray(coded, np.uint8)


def puncture_indices(num_input_bits: int) -> np.ndarray:
    """Serialized mother-bit indices kept by the rate-2/3 puncturer.

    num_input_bits includes the 4 tail bits; must be even (TETRA block
    sizes are)."""
    assert num_input_bits % PUNCTURE_2_3["period_in"] == 0
    blocks = num_input_bits // PUNCTURE_2_3["period_in"]
    keep = np.asarray(PUNCTURE_2_3["keep"], np.int64)
    return (np.arange(blocks)[:, None] * 8 + keep[None, :]).reshape(-1)


def puncture(mother_bits: np.ndarray, num_input_bits: int) -> np.ndarray:
    return np.asarray(mother_bits)[puncture_indices(num_input_bits)]


def depuncture_llrs(llrs: jnp.ndarray, num_input_bits: int) -> jnp.ndarray:
    """Scatter received LLRs back onto the mother grid; punctured positions
    become zero-LLR erasures.  llrs: (..., kept) -> (..., 4*num_input_bits)."""
    idx = jnp.asarray(puncture_indices(num_input_bits))
    full = jnp.zeros(llrs.shape[:-1] + (RATE_DEN * num_input_bits,),
                     llrs.dtype)
    return full.at[..., idx].set(llrs)


def viterbi_decode(llrs: jnp.ndarray, num_input_bits: int,
                   terminated: bool = True) -> jnp.ndarray:
    """Batched soft-decision Viterbi over the mother grid.

    llrs: (..., 4*num_input_bits) float32, convention llr > 0 <=> bit 1.
    num_input_bits counts tail bits; returns (..., num_input_bits - 4)
    decoded message bits when `terminated` (tail stripped), else all.
    """
    nxt, out = _tables()
    # branch metric sign table: +1 where output bit 1, -1 where 0
    sign = jnp.asarray(out.astype(np.float32) * 2.0 - 1.0)     # (16, 2, 4)
    nxt_j = jnp.asarray(nxt)                                   # (16, 2)
    # predecessor table: for new state s', u' = s'>>3; preds have any top bit
    # prev = (s' & 7) << 1 | {0, 1}
    sprime = np.arange(NUM_STATES)
    pred0 = ((sprime & 7) << 1)            # predecessor with u(k-4..)=0 LSB
    pred1 = ((sprime & 7) << 1) | 1
    u_new = sprime >> 3                    # input bit that led to s'
    pred0_j = jnp.asarray(pred0)
    pred1_j = jnp.asarray(pred1)
    u_new_j = jnp.asarray(u_new)

    batch_shape = llrs.shape[:-1]
    n = num_input_bits
    x = llrs.reshape((-1, n, RATE_DEN))                        # (B, N, 4)
    bsz = x.shape[0]

    neg = jnp.float32(-1e9)
    init = jnp.full((bsz, NUM_STATES), neg).at[:, 0].set(0.0)

    def step(metrics, step_llr):
        # step_llr: (B, 4); branch metric for (state s, input u):
        # sum_j llr_j * sign[s, u, j]
        bm = jnp.einsum("bj,suj->bsu", step_llr, sign)          # (B, 16, 2)
        # candidate metric reaching new state s' from its two predecessors
        m0 = metrics[:, pred0_j] + bm[:, pred0_j, u_new_j]      # (B, 16)
        m1 = metrics[:, pred1_j] + bm[:, pred1_j, u_new_j]
        take1 = m1 > m0
        new_metrics = jnp.where(take1, m1, m0)
        decision = take1.astype(jnp.uint8)                      # which pred
        return new_metrics, decision

    final, decisions = lax.scan(step, init, jnp.swapaxes(x, 0, 1))
    # decisions: (N, B, 16)

    end_state = (jnp.zeros(bsz, jnp.int32) if terminated
                 else jnp.argmax(final, axis=-1).astype(jnp.int32))

    def back(state, dec_t):
        # dec_t: (B, 16) — which predecessor won into each state
        d = jnp.take_along_axis(dec_t, state[:, None], axis=1)[:, 0]
        u = (state >> 3).astype(jnp.uint8)                     # input bit
        prev = ((state & 7) << 1) | d.astype(jnp.int32)
        return prev, u

    _, bits_rev = lax.scan(back, end_state, decisions, reverse=True)
    bits = jnp.swapaxes(bits_rev, 0, 1)                        # (B, N)
    if terminated:
        bits = bits[:, :n - 4]
    return bits.reshape(batch_shape + (bits.shape[-1],))


# ---------------------------------------------------------------------------
# EN 300 392-2 §8.2.3.1.3 puncturing schemes.  The spec defines the
# punctured stream as b'(j) = b(k(j)) over the serialized mother bits with
#
#     k(j) = 8*floor((i-1)/t) + P(i - t*floor((i-1)/t)),   j = 1..n_out
#
# where (t, P) select the base scheme and i maps j with periodic skips for
# the two traffic rates (the published scheme, as carried by public
# implementations, e.g. osmo-tetra lower_mac/tetra_conv_enc.c):
#
#     rate 2/3 (control channels):  t=3, P=(1,2,5),        i = j
#     rate 1/3:                     t=6, P=(1,2,3,5,6,7),  i = j
#     TCH/4.8 (292 -> 432):         t=3, P=(1,2,5),        i = j + (j-1)//65
#     TCH/2.4 (148 -> 432):         t=6, P=(1,2,3,5,6,7),  i = j + (j-1)//35
#
# All four yield strictly increasing, duplicate-free k covering exactly
# the (num_input_bits) trellis steps — pinned by tests/unit/test_tch.py.
# ---------------------------------------------------------------------------

_P_2_3 = (0, 1, 4)             # P=(1,2,5), 0-based
_P_1_3 = (0, 1, 2, 4, 5, 6)    # P=(1,2,3,5,6,7), 0-based

_PUNCTURE_SCHEMES = {
    # (num_input_bits incl. tail, num_output_bits): (t, P0, skip_period)
    (292, 432): (3, _P_2_3, 65),    # TCH/4.8
    (148, 432): (6, _P_1_3, 35),    # TCH/2.4
}


def puncture_indices_spec(num_input_bits: int,
                          num_output_bits: int) -> np.ndarray:
    """Spec-exact kept mother-bit indices (0-based) for the §8.2.3.1.3
    punctured rates (num_input_bits includes the 4 tail bits)."""
    if (num_input_bits, num_output_bits) in _PUNCTURE_SCHEMES:
        t, P0, skip = _PUNCTURE_SCHEMES[(num_input_bits, num_output_bits)]
        j = np.arange(1, num_output_bits + 1, dtype=np.int64)
        i = j + (j - 1) // skip
    elif num_output_bits * 2 == num_input_bits * 3:
        t, P0 = 3, _P_2_3                     # plain rate 2/3
        i = np.arange(1, num_output_bits + 1, dtype=np.int64)
    elif num_output_bits == num_input_bits * 3:
        t, P0 = 6, _P_1_3                     # plain rate 1/3
        i = np.arange(1, num_output_bits + 1, dtype=np.int64)
    else:
        raise ValueError(
            f"no §8.2.3.1.3 scheme for {num_input_bits}->{num_output_bits}")
    idx = 8 * ((i - 1) // t) + np.asarray(P0, np.int64)[(i - 1) % t]
    assert np.all(np.diff(idx) > 0) and idx[-1] < RATE_DEN * num_input_bits
    return idx


def encode_punctured(bits: np.ndarray, num_output_bits: int) -> np.ndarray:
    """Host-side tail-terminated encode at a §8.2.3.1.3 punctured rate."""
    bits = np.asarray(bits)
    mother = conv_encode(bits, terminate=True)
    return mother[puncture_indices_spec(len(bits) + 4, num_output_bits)]


def decode_punctured(llrs: jnp.ndarray, num_input_bits: int) -> jnp.ndarray:
    """Depuncture (zero-LLR erasures) + Viterbi for the punctured rates.

    llrs: (..., num_output_bits); num_input_bits includes the 4 tail bits;
    returns (..., num_input_bits - 4).
    """
    idx = jnp.asarray(puncture_indices_spec(num_input_bits,
                                            llrs.shape[-1]))
    full = jnp.zeros(llrs.shape[:-1] + (RATE_DEN * num_input_bits,),
                     llrs.dtype)
    full = full.at[..., idx].set(llrs)
    return viterbi_decode(full, num_input_bits, terminated=True)


def decode_rate_2_3(llrs: jnp.ndarray, num_input_bits: int) -> jnp.ndarray:
    """Depuncture + Viterbi for the rate-2/3 control channels.

    llrs: (..., 3*num_input_bits/2) soft bits -> (..., num_input_bits-4)."""
    full = depuncture_llrs(llrs, num_input_bits)
    return viterbi_decode(full, num_input_bits, terminated=True)


def encode_rate_2_3(bits: np.ndarray) -> np.ndarray:
    """Host-side encoder (tail-terminated + punctured): (N,) -> (3*(N+4)/2,)."""
    bits = np.asarray(bits)
    mother = conv_encode(bits, terminate=True)
    return puncture(mother, len(bits) + 4)
