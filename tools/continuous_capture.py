#!/usr/bin/env python3
"""Continuous capture: JSONL-log every decoded frame and attempt a voice
decode on each (operator-workflow parity with the reference's
continuous_capture.py — the behavioral spec for conformance runs,
SURVEY.md §3.2)."""

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
    ap.add_argument("--max-chunks", type=int, default=None)
    args = ap.parse_args()

    from tetraear_tpu.audio.blocks import block_from_hard_bits
    from tetraear_tpu.audio.export import write_wav
    from tetraear_tpu.io.recorder import JsonlFrameRecorder
    from tetraear_tpu.ui.capture_loop import CaptureLoop
    from tetraear_tpu.ui.cli import _make_source

    log_dir = Path("logs")
    records_dir = Path("records")
    log_dir.mkdir(exist_ok=True)
    records_dir.mkdir(exist_ok=True)
    run_id = datetime.now().strftime("%Y%m%d_%H%M%S")
    frames_log = log_dir / f"continuous_{run_id}.jsonl"

    args.gain = "auto"
    source = _make_source(args)
    loop = CaptureLoop(source, frequency=args.frequency * 1e6,
                       sample_rate=args.sample_rate * 1e6,
                       auto_decrypt=False, chunk_size=256 * 1024,
                       always_decode=bool(args.iq_file or args.synthetic),
                       afc=False)

    print(f"[INFO] Continuous capture at {args.frequency:.3f} MHz")
    print(f"[INFO] Frames log: {frames_log}")
    print("[INFO] Looking for unencrypted frames and voice...")

    state = {"frames": 0, "clear": 0, "voice": 0}
    rec = JsonlFrameRecorder(frames_log)

    def on_frame(frame):
        state["frames"] += 1
        rec.write(frame)
        if not frame.get("encrypted", True):
            state["clear"] += 1
            text = (frame.get("decoded_text", "")
                    or frame.get("sds_message", ""))
            if text and not text.startswith("[BIN"):
                clean = (text.replace("[GSM7]", "").replace("[LOC]", "")
                         .strip())
                alpha = sum(1 for c in clean if c.isalpha() and ord(c) < 128)
                if alpha > 3:
                    print(f"[READABLE!] Frame {state['frames']}: {text[:100]}")
                else:
                    print(f"[UNENCRYPTED] Frame {state['frames']}: "
                          f"type={frame.get('type_name')}, text={text[:50]}")
            else:
                print(f"[UNENCRYPTED] Frame {state['frames']}: "
                      f"type={frame.get('type_name')}, no text")
        bits = frame.get("bits")
        vp = loop.voice_processor
        if bits is not None and len(bits) >= 432 and vp and vp.working:
            audio = vp.decode_frame(block_from_hard_bits(bits))
            if audio.size > 0 and float(np.max(np.abs(audio))) > 1e-4:
                state["voice"] += 1
                vfile = records_dir / f"voice_{run_id}_{state['voice']:04d}.wav"
                write_wav(vfile, audio)
                print(f"[VOICE] Frame {state['frames']}: saved {vfile.name}")
        if state["frames"] % 100 == 0:
            print(f"[STATUS] Frames: {state['frames']}, "
                  f"Unencrypted: {state['clear']}, Voice: {state['voice']}")

    loop.on_frame = on_frame
    try:
        loop.run(max_chunks=args.max_chunks)
    except KeyboardInterrupt:
        pass
    finally:
        rec.close()
    print(f"\n[DONE] Captured {state['frames']} frames, "
          f"{state['clear']} unencrypted, {state['voice']} voice")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
