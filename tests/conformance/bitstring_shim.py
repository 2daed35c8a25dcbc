"""Minimal stand-in for the third-party `bitstring` package, sufficient to
import the reference implementation as a conformance oracle (the real
package is not installed in this environment).

Only the surface the reference uses is provided (BitArray construction
from bit iterables / bytes, slicing, .uint/.int/.bin, .tobytes()).  This is
test infrastructure written from the bitstring API docs — not reference
code.
"""

from __future__ import annotations

import numpy as np


class BitArray:
    __slots__ = ("_bits",)

    def __init__(self, auto=None):
        if auto is None:
            self._bits = np.zeros(0, dtype=np.uint8)
        elif isinstance(auto, BitArray):
            self._bits = auto._bits.copy()
        elif isinstance(auto, (bytes, bytearray)):
            self._bits = np.unpackbits(np.frombuffer(bytes(auto), np.uint8))
        else:
            arr = np.asarray(list(auto) if not isinstance(auto, np.ndarray)
                             else auto)
            self._bits = (arr != 0).astype(np.uint8)

    # -- sequence protocol --------------------------------------------------
    def __len__(self):
        return int(self._bits.size)

    def __getitem__(self, key):
        if isinstance(key, slice):
            out = BitArray()
            out._bits = self._bits[key].copy()
            return out
        return bool(self._bits[key])

    def __iter__(self):
        return iter(bool(b) for b in self._bits)

    def __eq__(self, other):
        if isinstance(other, BitArray):
            return np.array_equal(self._bits, other._bits)
        return NotImplemented

    # -- interpretations ----------------------------------------------------
    @property
    def uint(self):
        if self._bits.size == 0:
            raise ValueError("empty BitArray has no uint")
        val = 0
        for b in self._bits:
            val = (val << 1) | int(b)
        return val

    @property
    def int(self):
        val = self.uint
        if self._bits[0]:
            val -= 1 << self._bits.size
        return val

    @property
    def bin(self):
        return "".join("1" if b else "0" for b in self._bits)

    def tobytes(self):
        if self._bits.size == 0:
            return b""
        pad = (-self._bits.size) % 8
        bits = np.concatenate([self._bits,
                               np.zeros(pad, np.uint8)]) if pad else self._bits
        return np.packbits(bits).tobytes()

    def __repr__(self):
        return f"BitArray('0b{self.bin}')"
