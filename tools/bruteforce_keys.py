#!/usr/bin/env python3
"""Offline key brute-force over a recorded frames JSONL log.

Operator-workflow parity with the reference's bruteforce_keys.py, with a
real decryption path: every key is actually run through the TEA engine
(native C++ when built) against each encrypted frame's MAC payload, and
candidates are ranked by SDS/text readability.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def load_key_file(path: str) -> list[str]:
    keys = []
    for line in Path(path).read_text().splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split(":")
        if len(parts) == 3 and parts[2]:
            keys.append(parts[2])
    return keys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("frames_jsonl", type=str)
    ap.add_argument("-k", "--key-file", type=str, default="common_keys.txt")
    ap.add_argument("--max-frames", type=int, default=50)
    ap.add_argument("--top", type=int, default=10)
    args = ap.parse_args()

    from tetraear_tpu.crypto.keys import parse_user_keys
    from tetraear_tpu.crypto.native import bruteforce as native_bruteforce
    from tetraear_tpu.crypto.tea import TEADecryptor
    from tetraear_tpu.io.recorder import read_jsonl_frames
    from tetraear_tpu.protocol.parser import TetraProtocolParser
    from tetraear_tpu.utils.textscore import score_text

    print("[*] Loading keys...")
    hex_keys = load_key_file(args.key_file)
    # parse_user_keys yields (algorithm, key_bytes); engines take (key, alg)
    pairs = [(key, alg) for alg, key in parse_user_keys(hex_keys)]
    print(f"[*] Loaded {len(hex_keys)} keys ({len(pairs)} alg-key pairs)")

    print("[*] Loading captured frames...")
    encrypted = []
    for frame in read_jsonl_frames(args.frames_jsonl):
        if frame.get("encrypted", False):
            data = (frame.get("mac_pdu") or {}).get("data")
            if data:
                encrypted.append(frame)
    print(f"[*] Found {len(encrypted)} encrypted frames")
    if not encrypted:
        print("[!] No encrypted frames to test")
        return 0
    test_frames = encrypted[:args.max_frames]
    print(f"[*] Testing on {len(test_frames)} frames")

    parser = TetraProtocolParser()
    results = []
    for fidx, frame in enumerate(test_frames):
        try:
            payload = bytes.fromhex(frame["mac_pdu"]["data"])
        except Exception:
            continue
        if len(payload) < 8:
            continue
        if len(payload) % 8:
            payload += b"\x00" * (8 - len(payload) % 8)

        plains = native_bruteforce(pairs, payload)
        if plains is None:  # pure-Python fallback
            plains = []
            for key, alg in pairs:
                try:
                    plains.append(TEADecryptor(key, alg).decrypt(payload))
                except ValueError:
                    plains.append(None)

        for (key, alg), plain in zip(pairs, plains):
            if plain is None:
                continue
            text = parser.parse_sds_data(plain)
            if not text or text.startswith("[BIN"):
                continue
            s = score_text(text)
            if s > 1.2:
                results.append({"key": key.hex().upper(), "alg": alg,
                                "frame": fidx, "text": text[:100], "score": s})
                print(f"[+] Candidate! score {s:.2f} key {key.hex()[:20]}... "
                      f"-> {text[:60]}")

    print(f"\n[*] Bruteforce complete: {len(results)} potential matches")
    if results:
        results.sort(key=lambda x: x["score"], reverse=True)
        print("\n[+] Best results:")
        for i, r in enumerate(results[:args.top], 1):
            print(f"{i}. score {r['score']:.2f} {r['alg']} key {r['key']}")
            print(f"   text: {r['text']}")
    else:
        print("[-] No clear text found with these keys")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
