#!/usr/bin/env python3
"""Generate the checked-in recorded-IQ golden regression fixtures.

SURVEY.md §4 requires recorded-IQ fixtures with golden outputs ("the new
build must create them" — the reference repo ships none).  This tool
synthesizes three captures (clean / noisy+offset / encrypted-payload),
then runs the ACTUAL reference chain (/root/reference, imported with the
local bitstring shim) over each to produce the golden frame JSONL.  The
conformance test tests/conformance/test_golden_fixtures.py replays the
captures through this repo's chain and compares bit-exact WITHOUT
importing the reference — so conformance survives the reference tree
being unmounted.

Reference chain driven: tetraear/signal/processor.py SignalProcessor
.process + tetraear/core/decoder.py TetraDecoder.decode (the offline
conformance path, SURVEY §3.2).

Usage: python tools/make_golden.py [--outdir tests/conformance/fixtures]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests" / "conformance"))

import numpy as np  # noqa: E402


def _sanitize(obj):
    """Frame dict -> JSON-stable value (numpy scalars/arrays, bytes)."""
    if isinstance(obj, dict):
        return {k: _sanitize(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_sanitize(v) for v in obj]
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, (np.bool_,)):
        return bool(obj)
    if isinstance(obj, (bytes, bytearray)):
        return obj.hex()
    if hasattr(obj, "__dataclass_fields__"):
        import dataclasses
        return _sanitize(dataclasses.asdict(obj))
    return obj


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", type=str,
                    default=str(REPO / "tests" / "conformance" / "fixtures"))
    args = ap.parse_args()
    outdir = Path(args.outdir)
    outdir.mkdir(parents=True, exist_ok=True)

    import jax
    jax.config.update("jax_platforms", "cpu")

    import bitstring_shim
    sys.modules.setdefault("bitstring", bitstring_shim)
    sys.path.insert(0, "/root/reference")
    from tetraear.core.decoder import TetraDecoder as RefDecoder
    from tetraear.signal.processor import SignalProcessor as RefProcessor

    from tetraear_tpu.crypto.keys import COMMON_KEYS
    from tetraear_tpu.crypto.tea import TEAEncryptor
    from tetraear_tpu.io.replay import save_iq
    from tetraear_tpu.utils import synth

    # the first built-in TEA1 common key: the reference brute-force tries
    # it early, so the encrypted fixture decrypts deterministically
    key = COMMON_KEYS["TEA1"][0]
    secret = TEAEncryptor(key, "TEA1").encrypt(b"SECRET CALL 42!!")

    cases = [
        # (name, frames, payload, snr_db, offset_hz, auto_decrypt, seed)
        ("clean", 6, b"HELLO HELLO", None, 0.0, False, 2),
        ("noisy_offset", 6, b"HELLO HELLO", 14.0, 3000.0, False, 7),
        ("encrypted", 5, secret, None, 0.0, True, 11),
    ]

    make_long_mixed(outdir, RefProcessor, RefDecoder, secret)

    for name, frames, payload, snr, off, auto_dec, seed in cases:
        stream = synth.make_stream_bits(num_frames=frames, lead_bits=64,
                                        seed=seed, golden=True,
                                        payload=payload)
        iq = synth.bits_to_iq(stream, mapping="ref", freq_offset_hz=off,
                              snr_db=snr, seed=seed)
        iq_path = outdir / f"{name}.cf32"
        save_iq(iq_path, iq.astype(np.complex64), sample_rate=2.4e6,
                center_frequency=392.5e6)

        proc = RefProcessor(sample_rate=2.4e6)
        symbols = proc.process(iq.copy(), freq_offset=off)
        dec = RefDecoder(auto_decrypt=auto_dec)
        ref_frames = dec.decode(symbols)

        golden_path = outdir / f"{name}.golden.jsonl"
        with open(golden_path, "w") as f:
            meta = {"__meta__": {
                "generator": "tools/make_golden.py",
                "reference": "tetraear SignalProcessor.process + "
                             "TetraDecoder.decode",
                "freq_offset_hz": off, "snr_db": snr,
                "auto_decrypt": auto_dec, "seed": seed,
                "num_frames_synthesized": frames,
                "samples": int(len(iq)),
            }}
            f.write(json.dumps(meta) + "\n")
            for fr in ref_frames:
                f.write(json.dumps(_sanitize(fr), sort_keys=True) + "\n")
        print(f"{name}: {len(iq)} samples -> {iq_path.name} "
              f"({iq_path.stat().st_size/1e6:.1f} MB), "
              f"{len(ref_frames)} golden frames -> {golden_path.name}")
    return 0


CHUNK = 256 * 1024          # the reference CLI scripts' chunk size
LONG_SEED = 20260819


def _long_mixed_stream(secret: bytes) -> "np.ndarray":
    """Bit stream for the long_mixed fixture (VERDICT r2 #5): frames at
    controlled bit positions so the RESOURCE->END fragmentation pair
    SPANS the 256k-sample chunk boundary (bit ~4033), plus an encrypted
    (common-key-decryptable) frame, a BYPASS-winning frame
    (encrypted-flagged, clear readable payload), and late frames that see
    the far end of the AFC drift."""
    from tetraear_tpu import constants as C
    from tetraear_tpu.utils import synth
    rng = np.random.default_rng(LONG_SEED)

    patterns = (np.asarray(C.TS1, np.uint8), np.asarray(C.TS2, np.uint8))

    def max_corr22(bits):
        """Best 22-bit TS1/TS2 match count over all windows of `bits`."""
        best = 0
        for p in patterns:
            for o in range(len(bits) - 21):
                best = max(best, int(np.sum(bits[o:o + 22] == p)))
        return best

    def gap(n):
        return rng.integers(0, 2, n).astype(np.uint8)

    parts = [gap(64)]
    pos = 64

    def place(builder, at):
        """Append gap + slot at bit `at`, retrying gap/filler seeds until
        no 22-bit window in the 250 bits BEFORE the slot's sync (at
        +216) partial-matches TS1/TS2 at >=20/22 — the reference's
        find_sync takes the FIRST >=0.90 window and then skips 250 bits,
        so an earlier 20/22 fluke would decode this frame bit-shifted
        (observed while building this fixture: garbled [GSM7] frames)."""
        nonlocal pos
        assert at >= pos, (at, pos)
        for attempt in range(200):
            g = gap(at - pos)
            slot = builder(LONG_SEED + attempt)
            guard = np.concatenate([g, slot])[at - pos + 216 - 250:
                                              at - pos + 216]
            # only >=20/22 (corr 0.909) pre-empts the 0.90-threshold
            # scan pass (planted syncs guarantee that pass is used)
            if max_corr22(guard) <= 19:
                parts.append(g)
                parts.append(slot)
                pos = at + slot.size
                return
        raise RuntimeError(f"no sync-safe layout found at bit {at}")

    # clear-frame texts are repetition-rich: the reference's entropy
    # heuristic (decoder.py:1038-1049) flags payloads with unique/total
    # byte ratio > 0.7 as encrypted, and its decrypt scorer then PREFERS
    # a garbage TEA decrypt (see the BYPASS note in make_long_mixed)
    mk = synth.make_mac_resource_frame_bits
    place(lambda s: mk(b"SEG ONE ONE ONE", seed=s), 300)
    # fragment start late in chunk 0 (ends ~bit 3810 < 4033)...
    place(lambda s: mk(b"FRAG SPANS CHUNKS ", seed=s), 3300)
    # ...END early in chunk 1: reassembly crosses the chunk boundary
    place(lambda s: synth.make_mac_end_frame_bits(b"OK OK OK", seed=s),
          4150)
    place(lambda s: mk(secret, encrypted=True, seed=s), 9000)
    # encrypted-FLAGGED but clear readable payload: pins the discovered
    # quirk that the reference's BYPASS branch (decoder.py:657) is
    # unreachable — any TEA garbage decrypt earns +120 from the GSM7
    # last-resort SDS render and trips the >80 first-hit break
    # (decoder.py:777) before BYPASS is ever scored (verified over 40+
    # payload variants incl. the 2-key TEA3 path; garbage scores 172-196)
    place(lambda s: mk(b"OPEN TEXT CALL 7", encrypted=True, seed=s),
          13500)
    place(lambda s: mk(b"MID MID MESSAGE", seed=s), 22000)
    place(lambda s: mk(b"LATE LATE MESSAGE", seed=s), 38500)
    parts.append(gap(46150 - pos))
    return np.concatenate(parts)


def make_long_mixed(outdir: Path, RefProcessor, RefDecoder,
                    secret: bytes) -> None:
    """Generate the long_mixed fixture + golden by the reference's
    CHUNKED offline loop (continuous_capture.py:51-56 shape: stateless
    per-chunk processor, ONE stateful decoder), under a +/-120 Hz linear
    AFC drift and 18 dB wideband AWGN."""
    from tetraear_tpu.io.replay import save_iq
    from tetraear_tpu.utils import synth

    bits = _long_mixed_stream(secret)
    # synthesize on the reference's truncated-sps clock grid (130 samples
    # per symbol = 65/bit) so the planted frames are trackable and the
    # golden exercises REAL fragmentation/decrypt/BYPASS behavior; the
    # true-18kHz fixtures above pin the slip-quirk junk reproduction
    syms = synth.bits_to_symbols(bits)
    ph = synth.synthesize_symbol_phasors(syms, mapping="ref")
    iq = synth.upsample_hold(ph, 2.4e6, 2.4e6 / 130.0)
    # linear AFC drift -120 -> +120 Hz across the capture (the ref-compat
    # chain's uncompensated tolerance: its off-center DQPSK bins garble
    # decisions beyond ~+/-150 Hz — measured while building this fixture)
    n = len(iq)
    f_drift = -120.0 + 240.0 * np.arange(n) / n
    phase = 2 * np.pi * np.cumsum(f_drift) / 2.4e6
    iq = iq * np.exp(1j * phase)
    rng = np.random.default_rng(LONG_SEED)
    std = 10 ** (-18.0 / 20) / np.sqrt(2)
    iq = (iq + std * (rng.standard_normal(n)
                      + 1j * rng.standard_normal(n))).astype(np.complex64)

    iq_path = outdir / "long_mixed.sc16"
    save_iq(iq_path, iq, sample_rate=2.4e6, center_frequency=392.5e6)

    dec = RefDecoder(auto_decrypt=True)
    ref_frames = []
    n_chunks = 0
    for start in range(0, n, CHUNK):
        chunk = iq[start:start + CHUNK]
        if len(chunk) < 1000:
            break
        proc = RefProcessor(sample_rate=2.4e6)
        symbols = proc.process(chunk.copy(), freq_offset=0.0)
        for fr in dec.decode(symbols):
            fr["chunk"] = n_chunks
            ref_frames.append(fr)
        n_chunks += 1

    golden_path = outdir / "long_mixed.golden.jsonl"
    with open(golden_path, "w") as f:
        meta = {"__meta__": {
            "generator": "tools/make_golden.py make_long_mixed",
            "reference": "chunked continuous_capture loop "
                         "(256k-sample chunks, stateful decoder)",
            "chunk_samples": CHUNK, "drift_hz": [-120.0, 120.0],
            "snr_db": 18.0, "auto_decrypt": True, "seed": LONG_SEED,
            "samples": int(n), "chunks": n_chunks,
        }}
        f.write(json.dumps(meta) + "\n")
        for fr in ref_frames:
            f.write(json.dumps(_sanitize(fr), sort_keys=True) + "\n")
    print(f"long_mixed: {n} samples ({n / 2.4e6:.2f} s, {n_chunks} "
          f"chunks) -> {iq_path.name} "
          f"({iq_path.stat().st_size / 1e6:.1f} MB), "
          f"{len(ref_frames)} golden frames -> {golden_path.name}")


if __name__ == "__main__":
    raise SystemExit(main())
