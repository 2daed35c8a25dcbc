#!/usr/bin/env python3
"""Emit ~150 weak/pattern TETRA keys in ALG:ID:HEX format (operator
workflow parity with the reference's generate_common_keys.py: null/test
patterns, repeating bytes, sequential, low-hamming-weight, marker words,
and MCC/MNC-derived keys)."""

from __future__ import annotations


def generate_keys() -> list[str]:
    keys: list[str] = []

    keys += [
        "TEA1:0:00000000000000000000",
        "TEA1:0:11111111111111111111",
        "TEA1:0:FFFFFFFFFFFFFFFF1111",
        "TEA1:0:AAAAAAAAAAAAAAAAAAA0",
        "TEA1:0:12345678901234567890",
    ]
    for alg in ("TEA2", "TEA3"):
        keys += [
            f"{alg}:0:00000000000000000000000000000000",
            f"{alg}:0:11111111111111111111111111111111",
            f"{alg}:0:FFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFF",
            f"{alg}:0:AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA",
            f"{alg}:0:12345678901234567890123456789012",
        ]

    for i in range(10):
        keys.append(f"TEA1:0:{i:020X}")
        keys.append(f"TEA2:0:{i:032X}")
        keys.append(f"TEA3:0:{i:032X}")

    for bv in ("00", "11", "22", "33", "44", "55", "66", "77",
               "88", "99", "AA", "BB", "CC", "DD", "EE", "FF"):
        keys.append(f"TEA1:0:{bv * 10}")
        keys.append(f"TEA2:0:{bv * 16}")
        keys.append(f"TEA3:0:{bv * 16}")

    keys += [
        "TEA1:0:0123456789ABCDEF0123",
        "TEA2:0:0123456789ABCDEF0123456789ABCDEF",
        "TEA3:0:0123456789ABCDEF0123456789ABCDEF",
        "TEA1:0:FEDCBA9876543210FEDC",
        "TEA2:0:FEDCBA9876543210FEDCBA9876543210",
        "TEA3:0:FEDCBA9876543210FEDCBA9876543210",
    ]

    for i in (0x1, 0x3, 0x7, 0xF, 0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF):
        keys.append(f"TEA1:0:{i:020X}")
        keys.append(f"TEA2:0:{i:032X}")
        keys.append(f"TEA3:0:{i:032X}")

    for word in ("DEADBEEF", "CAFEBABE", "BAADF00D", "FEEDFACE", "C0FFEE00"):
        keys.append(f"TEA1:0:{(word * 3)[:20]}")
        keys.append(f"TEA2:0:{(word * 5)[:32]}")
        keys.append(f"TEA3:0:{(word * 5)[:32]}")

    for mcc in ("262", "222", "240", "228", "214"):
        for mnc in range(10):
            base = f"{mcc}{mnc:02d}"
            keys.append(f"TEA1:0:{base}{'0' * 15}")
            keys.append(f"TEA2:0:{base}{'0' * 27}")

    return keys


def main() -> int:
    keys = generate_keys()
    print(f"# Generated {len(keys)} common TETRA encryption keys")
    print("# Use with: tetraear_tpu listen --key-file <this file>")
    print()
    for key in keys:
        print(key)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
