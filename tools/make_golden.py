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


if __name__ == "__main__":
    raise SystemExit(main())
