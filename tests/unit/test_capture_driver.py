"""BladeRF capture driver tests with a module-level mocked `bladerf`
(reference hardware-free strategy, SURVEY.md §4 — but mocking the API the
driver actually calls, unlike the reference's stale RTL-era mocks)."""

import sys
import types
from unittest import mock

import numpy as np
import pytest

from tetraear_tpu.io import capture as capture_module


def _make_fake_bladerf():
    fake = types.SimpleNamespace()

    class FakeChannel:
        def __init__(self):
            self.frequency = 0
            self.sample_rate = 0
            self.bandwidth = 0
            self.gain_mode = None
            self.gain = 0
            self.enable = False

    class FakeBladeRF:
        def __init__(self, ident=None):
            self.ident = ident
            self.channel = FakeChannel()
            self.closed = False
            self.sync_configured = None

        def Channel(self, ch):
            return self.channel

        def sync_config(self, **kw):
            self.sync_configured = kw

        def sync_rx(self, buf, num_samples, timeout_ms=0):
            # interleaved int16 I/Q ramp in SC16-Q11 scale
            data = np.arange(num_samples * 2, dtype=np.int16)
            buf[:] = data.tobytes()

        def close(self):
            self.closed = True

    fake.BladeRF = FakeBladeRF
    fake.CHANNEL_RX = lambda i: i
    fake.GainMode = types.SimpleNamespace(Default="default", Manual="manual")
    fake.ChannelLayout = types.SimpleNamespace(RX_X1="rx_x1")
    fake.Format = types.SimpleNamespace(SC16_Q11="sc16_q11")
    fake.get_device_list = lambda: [
        types.SimpleNamespace(serial="abc123", usb_bus=1, usb_addr=2,
                              instance=0)]
    return fake


@pytest.fixture()
def fake_bladerf(monkeypatch):
    fake = _make_fake_bladerf()
    monkeypatch.setattr(capture_module, "bladerf", fake)
    monkeypatch.setattr(capture_module, "BLADERF_AVAILABLE", True)
    return fake


class TestBladeRFCapture:
    def test_open_configures_device(self, fake_bladerf):
        cap = capture_module.BladeRFCapture(frequency=392.5e6,
                                            sample_rate=2.4e6, gain=30)
        assert cap.open()
        ch = cap.sdr.channel
        assert ch.frequency == int(392.5e6)
        assert ch.sample_rate == int(2.4e6)
        assert ch.gain == 30
        assert ch.gain_mode == "manual"
        assert ch.enable is True
        assert cap.sdr.sync_configured["fmt"] == "sc16_q11"

    def test_auto_gain(self, fake_bladerf):
        cap = capture_module.BladeRFCapture(gain="auto")
        assert cap.open()
        assert cap.sdr.channel.gain_mode == "default"

    def test_read_samples_vectorized_conversion(self, fake_bladerf):
        cap = capture_module.BladeRFCapture()
        cap.open()
        samples = cap.read_samples(100)
        assert samples.dtype == np.complex64 and len(samples) == 100
        # ramp 0,1,2,3,... -> I=0,2,4..., Q=1,3,5..., normalized /2048
        np.testing.assert_allclose(samples[0], (0 + 1j) / 2048.0, rtol=1e-6)
        np.testing.assert_allclose(samples[1], (2 + 3j) / 2048.0, rtol=1e-6)

    def test_read_before_open_raises(self, fake_bladerf):
        cap = capture_module.BladeRFCapture()
        with pytest.raises(RuntimeError):
            cap.read_samples(10)

    def test_read_error_closes_and_raises(self, fake_bladerf):
        cap = capture_module.BladeRFCapture()
        cap.open()
        with mock.patch.object(cap.sdr, "sync_rx",
                               side_effect=OSError("usb gone")):
            with pytest.raises(RuntimeError):
                cap.read_samples(10)
        assert cap.sdr is None           # device released (capture.py:273-287)

    def test_set_frequency_live(self, fake_bladerf):
        cap = capture_module.BladeRFCapture()
        cap.open()
        cap.set_frequency(393.1e6)
        assert cap.sdr is not None
        assert cap.frequency == 393.1e6

    def test_device_enumeration(self, fake_bladerf):
        devices = capture_module.list_bladerf_devices()
        assert devices == [{"serial": "abc123", "usb_bus": 1, "usb_addr": 2,
                            "instance": 0}]

    def test_unavailable_module(self, monkeypatch):
        monkeypatch.setattr(capture_module, "BLADERF_AVAILABLE", False)
        cap = capture_module.BladeRFCapture()
        assert not cap.open()
        assert capture_module.list_bladerf_devices() == []
