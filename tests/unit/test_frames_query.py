"""Frame-log query layer (io/frames_query.py) + `frames` CLI subcommand —
the headless equivalent of the reference GUI's dropdown filters and live
statistics panel (modern.py; MIGRATION.md 'filtering' row).

Runs against the long_mixed conformance golden (encrypted + clear +
fragmented frames) so the filters face realistic records."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from tetraear_tpu.io.frames_query import (FrameFilter, filter_frames,
                                          format_frame_line, frames_stats,
                                          read_frames)

GOLDEN = (Path(__file__).resolve().parents[1] / "conformance" / "fixtures"
          / "long_mixed.golden.jsonl")


@pytest.fixture(scope="module")
def frames():
    return list(read_frames(GOLDEN))


class TestFrameFilter:
    def test_no_criteria_matches_all(self, frames):
        assert list(filter_frames(frames, FrameFilter())) == frames

    def test_type_filter(self, frames):
        out = list(filter_frames(frames, FrameFilter(types=("mac-frag",))))
        assert len(out) == 3
        assert all(f["type_name"] == "MAC-FRAG" for f in out)

    def test_encrypted_and_clear_partition(self, frames):
        enc = list(filter_frames(frames, FrameFilter(encrypted=True)))
        clr = list(filter_frames(frames, FrameFilter(encrypted=False)))
        assert len(enc) == 9 and len(enc) + len(clr) == len(frames)

    def test_group_filter(self, frames):
        grp = next(f["call_metadata"]["talkgroup_id"] for f in frames
                   if (f.get("call_metadata") or {}).get("talkgroup_id"))
        out = list(filter_frames(frames, FrameFilter(group=grp)))
        assert out and all(
            f["call_metadata"]["talkgroup_id"] == grp for f in out)

    def test_user_matches_source_or_dest(self, frames):
        ssi = next(f["call_metadata"]["source_ssi"] for f in frames
                   if (f.get("call_metadata") or {}).get("source_ssi"))
        out = list(filter_frames(frames, FrameFilter(user=ssi)))
        assert out
        for f in out:
            meta = f["call_metadata"]
            assert ssi in (meta.get("source_ssi"), meta.get("dest_ssi"))

    def test_sds_only(self, frames):
        out = list(filter_frames(frames, FrameFilter(sds_only=True)))
        assert len(out) == 14 and all(f.get("sds_message") for f in out)

    def test_timeslot(self, frames):
        out = list(filter_frames(frames, FrameFilter(timeslot=1)))
        assert all(f["timeslot"] == 1 for f in out)

    def test_combined_criteria_conjunct(self, frames):
        flt = FrameFilter(types=("mac-resource",), encrypted=True)
        out = list(filter_frames(frames, flt))
        for f in out:
            assert f["type_name"] == "MAC-RESOURCE" and f["encrypted"]

    def test_no_match(self, frames):
        assert not list(filter_frames(frames, FrameFilter(group=1)))


class TestStats:
    def test_counters(self, frames):
        st = frames_stats(frames)
        # 15 lines in the golden, minus the __meta__ header record that
        # read_frames must skip (it is not a frame)
        assert st.total == 14
        assert st.encrypted == 9 and st.decrypted == 9
        assert st.sds == 14
        assert st.by_type["MAC-FRAG"] == 3
        assert sum(st.by_type.values()) == st.total

    def test_crc_counter_uses_burst_crc(self):
        st = frames_stats([{"burst_crc": True}, {"burst_crc": False},
                           {"crc_ok": True}])
        assert st.total == 3 and st.crc_pass == 2


class TestReadFrames:
    def test_skips_malformed_lines(self, tmp_path):
        p = tmp_path / "log.jsonl"
        p.write_text('{"__meta__": {"generator": "x"}}\n'
                     '{"type_name": "A"}\nnot json\n[1, 2]\n\n'
                     '{"type_name": "B"}\n')
        assert [f["type_name"] for f in read_frames(p)] == ["A", "B"]


class TestFormatLine:
    def test_renders_key_fields(self, frames):
        enc = next(f for f in frames if f.get("encrypted"))
        line = format_frame_line(enc)
        assert f"#{enc['number']}" in line
        assert enc["type_name"] in line and "ENC" in line

    def test_string_sds_message(self):
        line = format_frame_line({"number": 1, "type_name": "X",
                                  "timeslot": 0,
                                  "sds_message": "[TXT] HI"})
        assert "'[TXT] HI'" in line

    def test_dict_sds_message(self):
        line = format_frame_line({"number": 1, "type_name": "X",
                                  "timeslot": 0,
                                  "sds_message": {"text": "YO"}})
        assert "'YO'" in line


class TestCLI:
    def _run(self, argv):
        from tetraear_tpu.ui.cli import main
        return main(argv)

    def test_stats(self, capsys):
        assert self._run(["frames", str(GOLDEN), "--stats"]) == 0
        out = capsys.readouterr().out
        assert "frames=14" in out and "MAC-FRAG:3" in out

    def test_filter_to_jsonl(self, tmp_path, capsys):
        dst = tmp_path / "enc.jsonl"
        rc = self._run(["frames", str(GOLDEN), "--encrypted",
                        "-o", str(dst)])
        assert rc == 0
        rows = [json.loads(l) for l in dst.read_text().splitlines()]
        assert len(rows) == 9 and all(r["encrypted"] for r in rows)

    def test_missing_log(self, tmp_path):
        assert self._run(["frames", str(tmp_path / "nope.jsonl")]) == 1
