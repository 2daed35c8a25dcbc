#!/usr/bin/env python3
"""Build the ETSI TS 300 395-2 reference codec for Linux.

Tool parity with tetraear/tools/install_tetra_codec.py (which downloads the
ETSI zip and builds with MSYS2 gcc).  This environment has no network
egress, so the source archive must be supplied locally:

    python tools/install_tetra_codec.py /path/to/en_30039502v010301p0.zip

Expected archive: ETSI EN 300 395-2 V1.3.1 codec reference C source
(md5 a8115fe68ef8f8cc466f4192572a1e3e).  Output binaries land in
tetraear_tpu/tetra_codec/bin/{cdecoder,ccoder,sdecoder,scoder}.
"""

from __future__ import annotations

import argparse
import hashlib
import re
import shutil
import subprocess
import sys
import tempfile
import zipfile
from pathlib import Path

CODECSUM = "a8115fe68ef8f8cc466f4192572a1e3e"
ROOT = Path(__file__).resolve().parents[1]
INSTALL_DIR = ROOT / "tetraear_tpu" / "tetra_codec" / "bin"


def normalize_line_endings(root: Path) -> None:
    print("[*] Normalizing line endings (CRLF -> LF)...")
    for path in root.rglob("*"):
        if path.suffix in (".c", ".h") or path.name.lower() == "makefile":
            try:
                path.write_bytes(path.read_bytes().replace(b"\r\n", b"\n"))
            except Exception:
                pass


def fix_makefiles(root: Path) -> None:
    print("[*] Adjusting makefiles for modern GCC...")
    for path in root.rglob("*"):
        if path.name.lower() != "makefile":
            continue
        data = path.read_text(encoding="utf-8", errors="ignore")
        data = re.sub(r"(?m)^ACC\s*=\s*acc\b", "ACC = gcc", data)
        data = re.sub(r"(?m)^(\s*)acc\b", r"\1gcc", data)
        data = re.sub(r"\bacc\b", "gcc", data)
        if "-fcommon" not in data:
            data = re.sub(r"(?m)^CFLAGS\s*=\s*(.*)$",
                          r"CFLAGS = -fcommon -w \1", data)
        # strip Windows .exe suffixes if present
        data = data.replace(".exe", "")
        path.write_text(data)


def build(src_root: Path) -> list[Path]:
    built = []
    makefiles = [p for p in src_root.rglob("*")
                 if p.name.lower() == "makefile"]
    for mk in makefiles:
        workdir = mk.parent
        print(f"[*] make in {workdir}")
        result = subprocess.run(["make", "-C", str(workdir)],
                                capture_output=True, timeout=600)
        if result.returncode != 0:
            print(f"[!] make failed in {workdir}: "
                  f"{result.stderr.decode('utf-8', 'ignore')[-400:]}")
        for stem in ("cdecoder", "ccoder", "sdecoder", "scoder"):
            for cand in (workdir / stem, workdir / f"{stem}.exe"):
                if cand.exists() and cand.stat().st_size > 0:
                    built.append(cand)
    return built


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("source_zip", type=Path,
                    help="local copy of the ETSI EN 300 395-2 codec zip")
    ap.add_argument("--skip-md5", action="store_true")
    args = ap.parse_args()

    if not args.source_zip.exists():
        print(f"[FAIL] {args.source_zip} not found.  This host has no "
              "network egress; obtain the ETSI zip elsewhere and copy it in.")
        return 1

    md5 = hashlib.md5(args.source_zip.read_bytes()).hexdigest()
    if md5 != CODECSUM:
        msg = f"[!] md5 mismatch: {md5} (expected {CODECSUM})"
        if args.skip_md5:
            print(msg + " — continuing (--skip-md5)")
        else:
            print(msg)
            return 1

    with tempfile.TemporaryDirectory(prefix="tetra-codec-") as work:
        work = Path(work)
        print("[*] Extracting...")
        with zipfile.ZipFile(args.source_zip) as zf:
            zf.extractall(work)
        # the ETSI zip nests further zips of the C source
        for inner in work.rglob("*.zip"):
            with zipfile.ZipFile(inner) as zf:
                zf.extractall(inner.parent / inner.stem)
        normalize_line_endings(work)
        fix_makefiles(work)
        built = build(work)
        if not built:
            print("[FAIL] no codec binaries were produced")
            return 1
        INSTALL_DIR.mkdir(parents=True, exist_ok=True)
        for exe in built:
            dest = INSTALL_DIR / exe.stem
            shutil.copy2(exe, dest)
            dest.chmod(0o755)
            print(f"[OK] installed {dest}")
    print(f"\n[DONE] codec binaries in {INSTALL_DIR}")
    print("Verify with: python tools/verify_codec.py")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
