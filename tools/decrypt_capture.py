#!/usr/bin/env python3
"""Live capture with common-key auto-decryption and readability triage
(operator-workflow parity with the reference's decrypt_capture.py).

Every decoded frame goes to a JSONL log; decrypted/clear frames whose text
scores as readable are echoed and appended to a readable_<run>.txt file.
"""

from __future__ import annotations

import argparse
import sys
from datetime import datetime
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def load_keys(path: str) -> list[str]:
    keys = []
    p = Path(path)
    if not p.exists():
        return keys
    for line in p.read_text().splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split(":")
        if len(parts) == 3:
            key_hex = parts[2].strip()
            if len(key_hex) % 2 == 1:
                key_hex += "0"
            keys.append(key_hex)
    return keys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-f", "--frequency", type=float, default=392.241)
    ap.add_argument("-s", "--sample-rate", type=float, default=2.4)
    ap.add_argument("-k", "--key-file", type=str, default="common_keys.txt")
    ap.add_argument("--iq-file", type=str, default=None)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--max-chunks", type=int, default=None)
    args = ap.parse_args()

    from tetraear_tpu.io.recorder import JsonlFrameRecorder
    from tetraear_tpu.ui.capture_loop import CaptureLoop
    from tetraear_tpu.ui.cli import _make_source
    from tetraear_tpu.utils.textscore import score_readability

    log_dir = Path("logs")
    log_dir.mkdir(exist_ok=True)
    run_id = datetime.now().strftime("%Y%m%d_%H%M%S")
    frames_log = log_dir / f"decrypt_{run_id}.jsonl"
    found_log = log_dir / f"readable_{run_id}.txt"

    print("[*] Loading common keys...")
    keys = load_keys(args.key_file)
    print(f"[*] Loaded {len(keys)} keys")

    args.gain = "auto"
    source = _make_source(args)
    loop = CaptureLoop(source, frequency=args.frequency * 1e6,
                       sample_rate=args.sample_rate * 1e6,
                       auto_decrypt=True, chunk_size=256 * 1024,
                       encryption_keys=keys,
                       always_decode=bool(args.iq_file or args.synthetic),
                       afc=False)

    state = {"frames": 0, "readable": 0}
    rec = JsonlFrameRecorder(frames_log)
    ff = found_log.open("w")

    def on_frame(frame):
        state["frames"] += 1
        rec.write(frame)
        text = frame.get("decoded_text") or frame.get("sds_message") or ""
        if text:
            s = score_readability(text)
            if s >= 2.0:
                state["readable"] += 1
                tag = "[DEC]" if frame.get("decrypted") else "[CLR]"
                line = (f"{tag} frame {state['frames']} "
                        f"score {s:.2f}: {text[:100]}")
                print(line)
                ff.write(line + "\n")
                ff.flush()

    loop.on_frame = on_frame
    try:
        loop.run(max_chunks=args.max_chunks)
    except KeyboardInterrupt:
        pass
    finally:
        rec.close()
        ff.close()
    print(f"[DONE] {state['frames']} frames, {state['readable']} readable "
          f"-> {frames_log}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
