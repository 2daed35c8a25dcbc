#!/usr/bin/env python3
"""Listen for clear (unencrypted) TETRA traffic: pure-ASCII text + voice
calls accumulated into 3+ second WAV clips.

Operator-workflow parity with the reference's listen_clear.py, generalized
to any source: hardware, IQ replay (--iq-file), or synthetic (--synthetic).
"""

from __future__ import annotations

import argparse
import sys
import time
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

    from tetraear_tpu.audio.accumulator import VoiceAccumulator
    from tetraear_tpu.audio.blocks import block_from_hard_bits
    from tetraear_tpu.audio.export import write_wav
    from tetraear_tpu.ui.capture_loop import CaptureLoop
    from tetraear_tpu.ui.cli import _make_source
    from tetraear_tpu.utils.textscore import is_pure_ascii

    log_dir = Path("logs")
    records_dir = Path("records")
    log_dir.mkdir(exist_ok=True)
    records_dir.mkdir(exist_ok=True)
    run_id = datetime.now().strftime("%Y%m%d_%H%M%S")
    text_log = log_dir / f"clear_text_{run_id}.txt"

    args.gain = "auto"
    source = _make_source(args)
    loop = CaptureLoop(source, frequency=args.frequency * 1e6,
                       sample_rate=args.sample_rate * 1e6,
                       auto_decrypt=False, chunk_size=256 * 1024,
                       always_decode=bool(args.iq_file or args.synthetic),
                       afc=False)
    voice_acc = VoiceAccumulator()
    state = {"frames": 0, "texts": 0, "vframes": 0, "calls": 0,
             "last_status": time.time()}

    print("=" * 70)
    print("LISTENING FOR CLEAR TEXT & VOICE")
    print("=" * 70)
    print("Text: only pure ASCII; Voice: accumulating 3+ second calls")

    tf = text_log.open("w")
    tf.write(f"=== CLEAR TEXT - {run_id} ===\n\n")

    def save_clip(audio):
        state["calls"] += 1
        dur = len(audio) / 8000
        vfile = records_dir / f"clear_voice_{run_id}_{state['calls']:04d}.wav"
        write_wav(vfile, audio)
        print(f"\n[VOICE!] Saved {vfile.name} ({dur:.1f}s)")

    def on_frame(frame):
        state["frames"] += 1
        if frame.get("encrypted", True):
            return
        text = frame.get("decoded_text") or frame.get("sds_message") or ""
        if text and is_pure_ascii(text):
            state["texts"] += 1
            print(f"\n[TEXT!] Frame {state['frames']}: {text}")
            tf.write(f"Frame {state['frames']}: {text}\n")
            tf.flush()
        bits = frame.get("bits")
        vp = loop.voice_processor
        if bits is not None and len(bits) >= 432 and vp and vp.working:
            audio = vp.decode_frame(block_from_hard_bits(bits))
            if audio.size > 0 and np.max(np.abs(audio)) > 1e-4:
                state["vframes"] += 1
                call_id = (frame.get("call_metadata") or {}).get(
                    "talkgroup_id") or "unk"
                final = voice_acc.add(call_id, audio)
                if final is not None:
                    save_clip(final)
        if time.time() - state["last_status"] > 30:
            print(f"[{datetime.now():%H:%M:%S}] {state['frames']} frames, "
                  f"{state['texts']} texts, {state['vframes']} vframes, "
                  f"{state['calls']} calls")
            state["last_status"] = time.time()

    loop.on_frame = on_frame
    try:
        loop.run(max_chunks=args.max_chunks)
    except KeyboardInterrupt:
        print("\nFinalizing...")
    for audio in voice_acc.finalize_all():
        save_clip(audio)
    tf.close()
    print(f"\nDONE: {state['frames']} frames, {state['texts']} pure texts, "
          f"{state['calls']} voice calls")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
