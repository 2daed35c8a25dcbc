"""Tests for tools/install_tetra_codec.py and audio/export.py.

The installer is the parity row for the reference's codec installer
(reference tools/install_tetra_codec.py downloads the ETSI zip and builds
with MSYS2 gcc; ours builds from a locally supplied zip).  No network and
no real ETSI archive exist here, so these tests exercise the full
extract -> normalize -> makefile-fix -> make -> install chain against a
synthetic archive with the same shape as the ETSI one: an outer zip
nesting inner source zips, CRLF line endings, the ancient `acc` compiler
name, and `.exe` target suffixes.
"""

from __future__ import annotations

import importlib.util
import os
import stat
import subprocess
import sys
import wave
import zipfile
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).resolve().parents[2]


def _load_installer():
    spec = importlib.util.spec_from_file_location(
        "install_tetra_codec", ROOT / "tools" / "install_tetra_codec.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


C_MAIN = r"""#include <stdio.h>
int main(void) { printf("%s\n", NAME); return 0; }
"""

# Deliberately hostile makefile: `acc` compiler, CRLF endings, .exe target.
MAKEFILE = (
    "ACC = acc\r\n"
    "CFLAGS = -O\r\n"
    "all: cdecoder.exe scoder.exe\r\n"
    "cdecoder.exe: main.c\r\n"
    "\tacc $(CFLAGS) -DNAME='\"cdecoder\"' -o cdecoder.exe main.c\r\n"
    "scoder.exe: main.c\r\n"
    "\t$(ACC) $(CFLAGS) -DNAME='\"scoder\"' -o scoder.exe main.c\r\n"
)


def _make_etsi_like_zip(tmp_path: Path, makefile_name: str = "makefile"):
    """Outer zip containing a nested inner zip of C source + makefile,
    mirroring the ETSI archive layout the installer documents."""
    src = tmp_path / "src"
    src.mkdir()
    (src / "main.c").write_bytes(C_MAIN.replace("\n", "\r\n").encode())
    (src / makefile_name).write_bytes(MAKEFILE.encode())

    inner = tmp_path / "c-code.zip"
    with zipfile.ZipFile(inner, "w") as zf:
        for p in src.iterdir():
            zf.write(p, p.name)

    outer = tmp_path / "en_30039502v010301p0.zip"
    with zipfile.ZipFile(outer, "w") as zf:
        zf.write(inner, "en_300395/c-code.zip")
    return outer


@pytest.mark.skipif(os.name != "posix", reason="needs make + cc")
class TestInstaller:
    def test_full_build_from_nested_zip(self, tmp_path, monkeypatch, capsys):
        mod = _load_installer()
        outer = _make_etsi_like_zip(tmp_path)
        install_dir = tmp_path / "bin"
        monkeypatch.setattr(mod, "INSTALL_DIR", install_dir)
        # `acc` doesn't exist; fix_makefiles must rewrite it to gcc.
        monkeypatch.setattr(
            sys, "argv",
            ["install_tetra_codec.py", str(outer), "--skip-md5"])
        rc = mod.main()
        assert rc == 0
        for stem in ("cdecoder", "scoder"):
            exe = install_dir / stem
            assert exe.exists(), f"{stem} not installed"
            assert exe.stat().st_mode & stat.S_IXUSR
            out = subprocess.run([str(exe)], capture_output=True, timeout=10)
            assert out.stdout.decode().strip() == stem

    def test_uppercase_makefile_is_built(self, tmp_path, monkeypatch):
        """rglob('makefile') was case-sensitive; Makefile archives must
        build too (fix_makefiles already handled any case)."""
        mod = _load_installer()
        outer = _make_etsi_like_zip(tmp_path, makefile_name="Makefile")
        install_dir = tmp_path / "bin"
        monkeypatch.setattr(mod, "INSTALL_DIR", install_dir)
        monkeypatch.setattr(
            sys, "argv",
            ["install_tetra_codec.py", str(outer), "--skip-md5"])
        assert mod.main() == 0
        assert (install_dir / "cdecoder").exists()

    def test_md5_gate_blocks_wrong_archive(self, tmp_path, monkeypatch):
        mod = _load_installer()
        outer = _make_etsi_like_zip(tmp_path)
        monkeypatch.setattr(mod, "INSTALL_DIR", tmp_path / "bin")
        monkeypatch.setattr(
            sys, "argv", ["install_tetra_codec.py", str(outer)])
        assert mod.main() == 1
        assert not (tmp_path / "bin").exists()

    def test_missing_archive(self, tmp_path, monkeypatch):
        mod = _load_installer()
        monkeypatch.setattr(
            sys, "argv",
            ["install_tetra_codec.py", str(tmp_path / "nope.zip")])
        assert mod.main() == 1

    def test_fix_makefiles_rewrites_acc_and_exe(self, tmp_path):
        mod = _load_installer()
        mk = tmp_path / "makefile"
        mk.write_bytes(MAKEFILE.encode())
        mod.normalize_line_endings(tmp_path)
        mod.fix_makefiles(tmp_path)
        text = mk.read_text()
        assert "acc" not in text.split("CFLAGS")[0] or "gcc" in text
        assert ".exe" not in text
        assert "\r\n" not in text
        assert "-fcommon" in text


class TestAudioExport:
    def _wav(self, tmp_path):
        from tetraear_tpu.audio.export import write_wav
        path = tmp_path / "t.wav"
        tone = np.sin(np.linspace(0, 2 * np.pi * 440, 800)).astype(np.float32)
        write_wav(path, tone, 8000)
        return path

    def test_write_wav_roundtrip(self, tmp_path):
        path = self._wav(tmp_path)
        with wave.open(str(path)) as wf:
            assert wf.getnchannels() == 1
            assert wf.getsampwidth() == 2
            assert wf.getframerate() == 8000
            data = np.frombuffer(wf.readframes(wf.getnframes()), np.int16)
        assert len(data) == 800
        assert data.max() > 30000  # full-scale tone survived

    def test_write_wav_clips(self, tmp_path):
        from tetraear_tpu.audio.export import write_wav
        path = tmp_path / "c.wav"
        write_wav(path, np.array([2.0, -2.0], np.float32))
        with wave.open(str(path)) as wf:
            data = np.frombuffer(wf.readframes(2), np.int16)
        assert data[0] == 32767 and data[1] == -32768

    def test_wav_to_mp3_with_stub_ffmpeg(self, tmp_path, monkeypatch):
        """Exercise the subprocess path with a PATH-stubbed ffmpeg that
        writes the output file (same contract the real one honors)."""
        from tetraear_tpu.audio import export
        stub_dir = tmp_path / "stubbin"
        stub_dir.mkdir()
        stub = stub_dir / "ffmpeg"
        stub.write_text("#!/bin/sh\n"
                        "# args: -y -i IN ... OUT ; copy IN to last arg\n"
                        'in=""; \n'
                        'prev=""; \n'
                        'for a in "$@"; do\n'
                        '  if [ "$prev" = "-i" ]; then in="$a"; fi\n'
                        '  prev="$a"; out="$a"\n'
                        "done\n"
                        'cp "$in" "$out"\n')
        stub.chmod(0o755)
        monkeypatch.setenv("PATH",
                           f"{stub_dir}:{os.environ.get('PATH', '')}")
        wav = self._wav(tmp_path)
        assert export.wav_to_mp3(wav) is True
        assert (tmp_path / "t.mp3").exists()

    def test_wav_to_mp3_no_ffmpeg(self, tmp_path, monkeypatch):
        from tetraear_tpu.audio import export
        monkeypatch.setattr("shutil.which", lambda _: None)
        wav = self._wav(tmp_path)
        assert export.wav_to_mp3(wav) is False

    def test_wav_to_mp3_ffmpeg_failure(self, tmp_path, monkeypatch):
        from tetraear_tpu.audio import export
        stub_dir = tmp_path / "stubbin"
        stub_dir.mkdir()
        stub = stub_dir / "ffmpeg"
        stub.write_text("#!/bin/sh\nexit 3\n")
        stub.chmod(0o755)
        monkeypatch.setenv("PATH",
                           f"{stub_dir}:{os.environ.get('PATH', '')}")
        wav = self._wav(tmp_path)
        assert export.wav_to_mp3(wav) is False
