"""Bit-array helpers (host side).

The reference uses the third-party ``bitstring`` package; this module provides
the small subset of semantics the protocol layer needs, implemented on plain
``numpy`` uint8 arrays:

* ``bits_to_bytes`` matches ``BitArray(bits).tobytes()``: MSB-first packing,
  zero-padded at the *end* to a byte boundary (core/protocol.py:442).
* ``bits_to_uint`` matches ``BitArray(bits).uint`` (big-endian bit order).
* ``bits_to_int`` matches ``BitArray(bits).int`` (two's complement).
* ``bytes_to_bits`` is the MSB-first inverse used by the decrypt scorer
  (core/decoder.py:753-757).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "as_bit_array",
    "bits_to_bytes",
    "bytes_to_bits",
    "bits_to_uint",
    "bits_to_int",
    "bits_to_binstr",
    "symbols_to_bit_pairs",
]


def as_bit_array(bits) -> np.ndarray:
    """Coerce a python/numpy sequence of 0/1 values to a uint8 array."""
    arr = np.asarray(bits)
    if arr.dtype != np.uint8:
        arr = arr.astype(np.uint8)
    return arr & 1


def bits_to_bytes(bits) -> bytes:
    """Pack bits MSB-first into bytes, zero-padding the tail."""
    arr = as_bit_array(bits)
    if arr.size == 0:
        return b""
    pad = (-arr.size) % 8
    if pad:
        arr = np.concatenate([arr, np.zeros(pad, dtype=np.uint8)])
    return np.packbits(arr).tobytes()


def bytes_to_bits(data: bytes) -> np.ndarray:
    """Unpack bytes MSB-first into a uint8 bit array."""
    if not data:
        return np.zeros(0, dtype=np.uint8)
    return np.unpackbits(np.frombuffer(data, dtype=np.uint8))


def bits_to_uint(bits) -> int:
    """Interpret bits as a big-endian unsigned integer."""
    val = 0
    for b in as_bit_array(bits):
        val = (val << 1) | int(b)
    return val


def bits_to_int(bits) -> int:
    """Interpret bits as a big-endian two's-complement signed integer."""
    arr = as_bit_array(bits)
    if arr.size == 0:
        return 0
    val = bits_to_uint(arr)
    if arr[0]:
        val -= 1 << arr.size
    return val


def bits_to_binstr(bits) -> str:
    """Render bits as a '0101...' string (matches BitArray.bin)."""
    return "".join("1" if b else "0" for b in as_bit_array(bits))


def symbols_to_bit_pairs(symbols) -> np.ndarray:
    """Expand 0..3 dibit symbols to a bit stream, MSB of each pair first.

    Matches protocol.py:210-214 / decoder.py:167.
    """
    syms = np.asarray(symbols).astype(np.int64) & 3
    out = np.empty(syms.size * 2, dtype=np.uint8)
    out[0::2] = (syms >> 1) & 1
    out[1::2] = syms & 1
    return out
