"""The committed codec binaries must carry provenance that matches the
current sources (VERDICT r3 item 8): `make -C native/codec install`
writes tetraear_tpu/tetra_codec/bin/PROVENANCE.md with a digest over the
C sources; if someone edits native/codec/ without reinstalling, this
test fails instead of shipping stale binaries silently."""

import hashlib
import re
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
BIN = REPO / "tetraear_tpu" / "tetra_codec" / "bin"
SRC_DIR = REPO / "native" / "codec"
# keep in sync with the Makefile's SRC list
SOURCES = ("tetra_dsp.c", "tetra_celp.c", "tetra_channel.c", "scoder.c",
           "sdecoder.c", "ccoder.c", "cdecoder.c", "tetra_codec.h",
           "serial_io.h")


def _source_digest() -> str:
    # mirror `sha256sum $(SRC) | sort | sha256sum`
    lines = []
    for name in SOURCES:
        h = hashlib.sha256((SRC_DIR / name).read_bytes()).hexdigest()
        lines.append(f"{h}  {name}\n")
    joined = "".join(sorted(lines))
    return hashlib.sha256(joined.encode()).hexdigest()


def test_provenance_file_exists_and_matches_sources():
    prov = BIN / "PROVENANCE.md"
    assert prov.exists(), ("run `make -C native/codec install` to "
                           "(re)generate binaries + provenance")
    text = prov.read_text()
    m = re.search(r"`([0-9a-f]{64})`", text)
    assert m, "PROVENANCE.md carries no source digest"
    assert m.group(1) == _source_digest(), (
        "native/codec sources changed since the committed binaries were "
        "built — run `make -C native/codec install` and commit the result")


def test_binaries_present():
    for exe in ("ccoder", "cdecoder", "scoder", "sdecoder"):
        p = BIN / exe
        assert p.exists() and p.stat().st_size > 1000
