#!/usr/bin/env python3
"""Build a release: wheel + sdist + versioned zip package.

Tool parity with the reference's tools/build_exe.py +
create_release_package.py (PyInstaller exe + zip for Windows), redesigned
for the Python-package deployment model of this framework: git-describe
versioning, `python -m build`-less setuptools invocation (works offline),
and a zip bundling the wheel, tools, and docs.
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import zipfile
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def get_version() -> str:
    """Version from git describe (tools/build_exe.py:35 parity)."""
    try:
        out = subprocess.run(["git", "describe", "--tags", "--always",
                              "--dirty"], capture_output=True, text=True,
                             cwd=ROOT, timeout=10)
        if out.returncode == 0 and out.stdout.strip():
            return out.stdout.strip().lstrip("v")
    except Exception:
        pass
    return "0.1.0"


def build_wheel(out_dir: Path) -> list[Path]:
    out_dir.mkdir(parents=True, exist_ok=True)
    cmds = [
        [sys.executable, "-m", "pip", "wheel", "--no-deps", "--no-build-isolation",
         "-w", str(out_dir), str(ROOT)],
    ]
    for cmd in cmds:
        r = subprocess.run(cmd, capture_output=True, text=True, cwd=ROOT,
                           timeout=600)
        if r.returncode != 0:
            print(f"[!] {' '.join(cmd[:4])}... failed:\n{r.stderr[-800:]}")
            return []
    return sorted(out_dir.glob("tetraear_tpu-*.whl"))


def build_zip(out_dir: Path, version: str, wheels: list[Path]) -> Path:
    out_dir.mkdir(parents=True, exist_ok=True)
    zip_path = out_dir / f"tetraear-tpu-{version}.zip"
    include = ["README.md", "COMPONENTS.md", "SURVEY.md", "bench.py",
               "pyproject.toml"]
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for name in include:
            p = ROOT / name
            if p.exists():
                zf.write(p, name)
        for tool in sorted((ROOT / "tools").glob("*.py")):
            zf.write(tool, f"tools/{tool.name}")
        for src in sorted((ROOT / "native").rglob("*")):
            if src.suffix in (".cpp", ".c") or src.name == "Makefile":
                zf.write(src, str(src.relative_to(ROOT)))
        for whl in wheels:
            zf.write(whl, f"wheels/{whl.name}")
    return zip_path


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-o", "--out-dir", type=Path, default=ROOT / "dist")
    ap.add_argument("--zip-only", action="store_true")
    args = ap.parse_args()

    version = get_version()
    print(f"[*] Version: {version}")
    wheels = [] if args.zip_only else build_wheel(args.out_dir)
    for w in wheels:
        print(f"[OK] wheel: {w}")
    zip_path = build_zip(args.out_dir, version, wheels)
    print(f"[OK] release package: {zip_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
