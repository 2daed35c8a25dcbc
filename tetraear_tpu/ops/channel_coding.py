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
