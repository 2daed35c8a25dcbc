"""SessionAggregator, SDS message reassembly, and chunk-overlap recovery."""

import numpy as np

from tetraear_tpu.ui.session import SessionAggregator, reassemble_sds_message


class TestReassembleSds:
    def test_passthrough_existing(self):
        assert reassemble_sds_message({"sds_message": "[TXT] hi"}) == "[TXT] hi"
        assert reassemble_sds_message({"decoded_text": "[TXT] yo"}) == "[TXT] yo"

    def test_encrypted_undecrypted_skipped(self):
        assert reassemble_sds_message({"encrypted": True}) is None

    def test_fragment_reassembly(self):
        store = {}
        base = {"encrypted": False, "address_source": 123,
                "address_destination": 456, "fragment_id": 7}
        f1 = dict(base, fragment_index=0,
                  mac_pdu={"data": bytes([0x82]) + b"Hello "})
        f2 = dict(base, fragment_index=1, is_last_fragment=True,
                  mac_pdu={"data": b"fragmented world"})
        assert reassemble_sds_message(f1, store) is None
        out = reassemble_sds_message(f2, store)
        assert out == "[TXT] Hello fragmented world"
        assert store == {}                       # buffer flushed


class TestSessionAggregator:
    def _frame(self, n, tg=None, ssi=None, text=None, mcc=None):
        f = {"number": n, "type_name": "MAC-RESOURCE", "encrypted": False,
             "burst_crc": True, "additional_info": {}}
        if text:
            f["sds_message"] = text
        meta = {}
        if tg:
            meta.update({"talkgroup_id": tg, "call_identifier": 1,
                         "call_type": "Group", "encryption": False})
        if ssi:
            meta["source_ssi"] = ssi
        if mcc:
            meta["mcc"] = mcc
            meta["mnc"] = 1
        if meta:
            f["call_metadata"] = meta
        return f

    def test_tables_accumulate(self):
        agg = SessionAggregator()
        for i in range(5):
            agg.on_frame(self._frame(i, tg=1000, ssi=5000 + i % 2,
                                     text=f"[TXT] msg {i}", mcc=260))
        assert agg.frame_count == 5
        assert 1000 in agg.groups and agg.groups[1000]["frames"] == 5
        assert len(agg.users) == 2
        assert len(agg.messages) == 5
        row = agg.on_frame(self._frame(9, mcc=260))
        assert row["country"].endswith("Poland")
        s = agg.summary()
        assert "TG 1000: 5 frames" in s
        assert "MCC 260" in s

    def test_validator_integration(self):
        agg = SessionAggregator(expected_mcc=260)
        row = agg.on_frame(self._frame(0, tg=5, mcc=260))
        assert row["valid"] is True
        assert row["confidence"] > 0.9

    def test_frame_cap(self):
        agg = SessionAggregator()
        agg.MAX_FRAMES = 10
        for i in range(25):
            agg.on_frame(self._frame(i))
        assert len(agg.frames) == 10


class TestChunkOverlapRecovery:
    def test_overlap_recovers_edge_frames(self, tmp_path):
        """A frame straddling the chunk boundary is lost without overlap and
        recovered (without duplicates) with overlap."""
        from tetraear_tpu.io.replay import FileReplaySource, save_iq
        from tetraear_tpu.ui.capture_loop import CaptureLoop
        from tetraear_tpu.utils import synth

        stream = synth.make_stream_bits(num_frames=10, lead_bits=64, seed=2,
                                        golden=True)
        syms = synth.bits_to_symbols(stream)
        ph = synth.synthesize_symbol_phasors(syms, mapping="ref")
        iq = synth.upsample_hold(ph, 2.4e6, 2.4e6 / 130.0).astype(np.complex64)
        path = tmp_path / "x.cf32"
        save_iq(path, iq, sample_rate=2.4e6)

        def run(overlap):
            src = FileReplaySource(path)
            loop = CaptureLoop(src, sample_rate=2.4e6, auto_decrypt=False,
                               always_decode=True, afc=False,
                               chunk_size=64 * 1024, overlap=overlap)
            frames = []
            loop.on_frame = frames.append
            loop.run(max_chunks=20)
            return frames

        without = run(0)
        with_overlap = run(48 * 1024)
        assert len(with_overlap) > len(without)
        # no duplicates: frame bit patterns unique
        import hashlib
        hashes = [hashlib.md5(np.asarray(f["bits"], np.uint8).tobytes())
                  .hexdigest() for f in with_overlap]
        assert len(hashes) == len(set(hashes))
