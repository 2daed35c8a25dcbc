#!/usr/bin/env python3
"""Headless attempt-loop capture: keep capturing until readable text or
non-silent voice is found (tool parity with
tetraear/tools/rtl_auto_capture.py:117-252)."""

from __future__ import annotations

import argparse
import sys
from datetime import datetime
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-f", "--frequency", type=float, default=392.241)
    ap.add_argument("-s", "--sample-rate", type=float, default=2.4)
    ap.add_argument("--iq-file", type=str, default=None)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--key-file", type=str, default=None)
    ap.add_argument("--attempts", type=int, default=10)
    ap.add_argument("--chunks-per-attempt", type=int, default=20)
    args = ap.parse_args()

    from tetraear_tpu.audio.blocks import block_from_hard_bits
    from tetraear_tpu.audio.export import write_wav
    from tetraear_tpu.io.recorder import JsonlFrameRecorder
    from tetraear_tpu.ui.capture_loop import CaptureLoop
    from tetraear_tpu.ui.cli import _load_keys, _make_source
    from tetraear_tpu.utils.textscore import is_pure_ascii

    log_dir = Path("logs")
    records_dir = Path("records")
    log_dir.mkdir(exist_ok=True)
    records_dir.mkdir(exist_ok=True)
    run_id = datetime.now().strftime("%Y%m%d_%H%M%S")

    for attempt in range(1, args.attempts + 1):
        print(f"\n[ATTEMPT {attempt}/{args.attempts}]")
        args.gain = "auto"
        source = _make_source(args)
        loop = CaptureLoop(source, frequency=args.frequency * 1e6,
                           sample_rate=args.sample_rate * 1e6,
                           auto_decrypt=True, chunk_size=256 * 1024,
                           always_decode=bool(args.iq_file or args.synthetic),
                           afc=False)
        _load_keys(args, loop)
        found = {"hit": False}
        rec = JsonlFrameRecorder(log_dir / f"auto_{run_id}_{attempt:02d}.jsonl")

        def on_frame(frame):
            rec.write(frame)
            text = frame.get("decoded_text") or frame.get("sds_message") or ""
            if text and is_pure_ascii(text):
                print(f"[HIT] readable text: {text[:80]}")
                found["hit"] = True
            bits = frame.get("bits")
            vp = loop.voice_processor
            if bits is not None and len(bits) >= 432 and vp and vp.working:
                audio = vp.decode_frame(block_from_hard_bits(bits))
                if audio.size > 0 and float(np.max(np.abs(audio))) > 1e-4:
                    vfile = records_dir / f"auto_voice_{run_id}_{attempt:02d}.wav"
                    write_wav(vfile, audio)
                    print(f"[HIT] non-silent voice: {vfile.name}")
                    found["hit"] = True

        loop.on_frame = on_frame
        try:
            loop.run(max_chunks=args.chunks_per_attempt)
        except KeyboardInterrupt:
            rec.close()
            return 0
        rec.close()
        if found["hit"]:
            print(f"[DONE] hit on attempt {attempt}")
            return 0
    print("[DONE] no readable text or voice found")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
