"""Full TETRA channel coding chains (ETSI EN 300 392-2 §8): the `etsi`
profile's encode/decode stack per logical channel.

    type-1 (MAC bits)
      -> +CRC-16 block code      -> type-2
      -> +4 tail, RCPC encode,
         puncture to rate 2/3    -> type-3
      -> block interleave        -> type-4
      -> scramble                -> type-5 (over-the-air bits)

Decode runs the inverse with soft bits: descramble (sign-flip), block
de-interleave, depuncture to erasures, Viterbi, CRC check.

Channel geometry (type-1 bits / over-the-air bits):
    BSCH    60 / 120      SCH/HD, BNCH, STCH   124 / 216
    SCH/F   268 / 432

The reference never implements this chain (protocol.py:300 "SIMPLIFIED...
we do not do full channel decoding") — conformance tests here are against
this module's own encoder plus NumPy oracles (SURVEY.md §7 hard parts).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from tetraear_tpu.ops import interleave as il
from tetraear_tpu.ops import scramble as scr
from tetraear_tpu.ops import viterbi as vit
from tetraear_tpu.ops.crc import crc16_bits_arr, crc16_batch

CHANNEL_GEOMETRY = {
    # name: (type1_bits, air_bits)
    "BSCH": (60, 120),
    "SCH/HU": (92, 168),      # uplink half-slot (control uplink burst)
    "SCH/HD": (124, 216),
    "BNCH": (124, 216),
    "STCH": (124, 216),
    "SCH/F": (268, 432),
}


class ChannelDecodeResult(NamedTuple):
    bits: jnp.ndarray      # (..., type1) decoded MAC bits
    crc_ok: jnp.ndarray    # (...,) bool


def encode_channel(type1_bits: np.ndarray, channel: str = "SCH/F",
                   ecc30: int = 0) -> np.ndarray:
    """Host-side full encode (test vectors / transmitter): type-1 -> type-5."""
    k1, air = CHANNEL_GEOMETRY[channel]
    bits = np.asarray(type1_bits).astype(np.uint8) & 1
    assert bits.shape[-1] == k1, (bits.shape, k1)
    type2 = np.concatenate([bits, crc16_bits_arr(bits)])
    type3 = vit.encode_rate_2_3(type2)
    assert type3.shape[-1] == air, (type3.shape, air)
    type4 = np.asarray(il.interleave(jnp.asarray(type3), channel))
    seq = scr.scrambling_sequence(ecc30, air)
    return (type4 ^ seq).astype(np.uint8)


def decode_channel_soft(llrs: jnp.ndarray, channel: str = "SCH/F",
                        ecc30: int = 0) -> ChannelDecodeResult:
    """Device-side full decode from soft bits (llr > 0 <=> bit 1).

    llrs: (..., air_bits) float32 -> type-1 bits + CRC verdict, batched.
    """
    k1, air = CHANNEL_GEOMETRY[channel]
    assert llrs.shape[-1] == air, (llrs.shape, air)
    x = scr.scramble_soft(llrs, ecc30)
    x = il.deinterleave(x, channel)
    bits2 = vit.decode_rate_2_3(x, k1 + 16 + 4)      # type-2: data + CRC
    data = bits2[..., :k1]
    rx_crc = bits2[..., k1:k1 + 16].astype(jnp.int32)
    calc = crc16_batch(data).astype(jnp.int32)
    ok = jnp.all(calc == rx_crc, axis=-1)
    return ChannelDecodeResult(data.astype(jnp.uint8), ok)


def decode_channel_hard(bits: jnp.ndarray, channel: str = "SCH/F",
                        ecc30: int = 0) -> ChannelDecodeResult:
    """Hard-bit convenience wrapper: {0,1} -> +/-1 LLRs."""
    llrs = bits.astype(jnp.float32) * 2.0 - 1.0
    return decode_channel_soft(llrs, channel, ecc30)


# ---------------------------------------------------------------------------
# Traffic channels (EN 300 392-2 §8 table 8.1 geometries).  No CRC — TCH
# quality is BER-bounded, not block-gated.  TCH/S ("speech") carries the
# vocoder's own 432 coded bits: the ETSI ACELP channel coder/decoder
# (ccoder/cdecoder, audio/voice.py contract) performs the FEC, so the air
# chain outside the codec is interleave + scramble only — exactly what the
# reference's voice path assumes when it feeds 432 soft bits straight into
# cdecoder (ui/modern.py:2369-2417).
#
#     TCH/7.2   432 type-1 -> 432   (no FEC; scramble only)
#     TCH/4.8   288 type-1 -> +4 tail, RCPC 292->432, N-burst interleave
#     TCH/2.4   144 type-1 -> +4 tail, RCPC 148->432, N-burst interleave
#     TCH/S     432 type-3 (vocoder) -> block interleave + scramble
#
# N-burst depth: 1, 4 or 8 (§8.2.4.2); see ops/interleave.py.
# ---------------------------------------------------------------------------

TCH_GEOMETRY = {
    # name: (type1_bits, air_bits_per_burst_block)
    "TCH/7.2": (432, 432),
    "TCH/4.8": (288, 432),
    "TCH/2.4": (144, 432),
    "TCH/S": (432, 432),
}


def _scramble_blocks(blocks: np.ndarray, ecc30: int) -> np.ndarray:
    seq = scr.scrambling_sequence(ecc30, blocks.shape[-1])
    return (blocks ^ seq).astype(np.uint8)


def encode_tch(type1_blocks: np.ndarray, channel: str, ecc30: int = 0,
               depth: int = 1) -> np.ndarray:
    """Host-side traffic encode: (M, k1) -> (M + depth - 1, 432) type-5.

    depth > 1 (only meaningful for TCH/4.8 and TCH/2.4) spreads each coded
    block diagonally over `depth` burst blocks.
    """
    k1, air = TCH_GEOMETRY[channel]
    blocks = np.atleast_2d(np.asarray(type1_blocks)).astype(np.uint8) & 1
    assert blocks.shape[-1] == k1, (blocks.shape, k1)

    if channel == "TCH/7.2":
        assert depth == 1
        return _scramble_blocks(blocks, ecc30)
    if channel == "TCH/S":
        assert depth == 1
        t4 = np.asarray(il.interleave(jnp.asarray(blocks), "SCH/F"))
        return _scramble_blocks(t4, ecc30)

    t3 = np.stack([vit.encode_punctured(b, air) for b in blocks])
    t4 = il.interleave_multiburst(t3, depth, "SCH/F")
    return _scramble_blocks(t4, ecc30)


def decode_tch_soft(llr_blocks: jnp.ndarray, channel: str, ecc30: int = 0,
                    depth: int = 1) -> jnp.ndarray:
    """Traffic decode from per-burst soft bits (llr > 0 <=> bit 1).

    llr_blocks: (M + depth - 1, 432) float32.
    Returns (M, k1) uint8 bits — except TCH/S, which returns (M, 432)
    descrambled/de-interleaved *soft* values for the vocoder channel
    decoder (audio/blocks.block_from_soft_llrs feeds them to cdecoder).
    """
    k1, air = TCH_GEOMETRY[channel]
    x = jnp.atleast_2d(llr_blocks)
    assert x.shape[-1] == air, (x.shape, air)
    x = scr.scramble_soft(x, ecc30)

    if channel == "TCH/7.2":
        assert depth == 1
        return (x > 0).astype(jnp.uint8)
    if channel == "TCH/S":
        assert depth == 1
        return il.deinterleave(x, "SCH/F")

    t3 = jnp.asarray(il.deinterleave_multiburst(np.asarray(x), depth,
                                                "SCH/F"))
    return vit.decode_punctured(t3, k1 + 4)
