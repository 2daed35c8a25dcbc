"""Settings/presets persistence (ui/settings.py — behavioral parity with
tetraear/ui/modern.py:326-413: defaults incl. gain 50 / SR 2.4e6 /
freq 390.865, JSON round-trip in the user data dir, reference env-var
override honored)."""

import json

import pytest

from tetraear_tpu.ui.settings import FrequencyManager, SettingsManager


@pytest.fixture()
def data_dir(tmp_path, monkeypatch):
    # both the reference's env name and ours must work
    monkeypatch.delenv("TETRAEAR_TPU_DATA_DIR", raising=False)
    monkeypatch.setenv("TETRAEAR_DATA_DIR", str(tmp_path))
    return tmp_path


class TestSettingsManager:
    def test_reference_defaults(self, data_dir):
        s = SettingsManager()
        assert s.get("gain") == 50.0              # modern.py:329-341
        assert s.get("sample_rate") == 2.4e6
        assert s.get("last_frequency") == 390.865
        assert s.get("auto_decrypt") is True

    def test_round_trip_and_merge(self, data_dir):
        s = SettingsManager()
        s.set("gain", 23.5)
        s.set("custom_key", "x")
        s.save()
        assert (data_dir / "settings.json").exists()
        s2 = SettingsManager()
        assert s2.get("gain") == 23.5
        assert s2.get("custom_key") == "x"
        # unknown keys in the file don't clobber defaults
        assert s2.get("sample_rate") == 2.4e6

    def test_corrupt_file_falls_back_to_defaults(self, data_dir):
        (data_dir / "settings.json").write_text("{not json")
        s = SettingsManager()
        assert s.get("gain") == 50.0


class TestFrequencyManager:
    def test_default_presets(self, data_dir):
        f = FrequencyManager()
        freqs = [e["freq"] for e in f.get_all()]
        assert 390.0 in freqs and 392.5 in freqs  # Poland presets

    def test_add_persists(self, data_dir):
        f = FrequencyManager()
        f.add(392.225, "Test", "added by test")
        raw = json.loads((data_dir / "frequencies.json").read_text())
        assert any(e["freq"] == 392.225 for e in raw)
        f2 = FrequencyManager()
        assert any(e["label"] == "Test" for e in f2.get_all())
