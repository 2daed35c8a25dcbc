"""Headless waterfall / auto-spectrum / AFC / status-machine tests."""

import numpy as np

from tetraear_tpu.ui.waterfall import (AutoSpectrumCalibration,
                                       TetraStatusMachine, WaterfallBuffer,
                                       colorize, find_spike_band,
                                       follow_frequency_step,
                                       render_waterfall_rgb)


class FakeClock:
    def __init__(self):
        self.t = 100.0

    def __call__(self):
        return self.t


class TestWaterfallBuffer:
    def test_history_depth_and_denoise(self):
        buf = WaterfallBuffer()
        freqs = np.arange(64.0)
        for i in range(250):
            buf.update_spectrum(freqs, np.full(64, -80.0 + i * 0.1))
        arr = buf.as_array()
        assert arr.shape == (200, 64)         # deque(200)
        # IIR smoother lags the raw input
        assert arr[-1, 0] < -80.0 + 249 * 0.1

    def test_denoiser_alpha(self):
        buf = WaterfallBuffer()
        freqs = np.arange(8.0)
        buf.update_spectrum(freqs, np.zeros(8))
        buf.update_spectrum(freqs, np.full(8, 10.0))
        # after step: 0.15*10 + 0.85*0 = 1.5
        np.testing.assert_allclose(buf.current_power, 1.5)

    def test_no_denoise(self):
        buf = WaterfallBuffer(denoise=False)
        buf.update_spectrum(np.arange(4.0), np.full(4, -50.0))
        np.testing.assert_allclose(buf.current_power, -50.0)


class TestColormap:
    def test_gradient_endpoints(self):
        rgb = colorize(np.array([-100.0, -20.0]), -100, -20)
        np.testing.assert_array_equal(rgb[0], [0, 0, 64])      # deep blue
        np.testing.assert_array_equal(rgb[1], [255, 0, 0])     # red

    def test_render_shape(self):
        buf = WaterfallBuffer()
        for _ in range(5):
            buf.update_spectrum(np.arange(32.0), np.full(32, -60.0))
        img = render_waterfall_rgb(buf)
        assert img.shape == (5, 32, 3) and img.dtype == np.uint8

    def test_save_png_decodes_back(self, tmp_path):
        """The stdlib PNG writer must produce a spec-valid file whose
        decompressed scanlines reproduce the pixels exactly."""
        import struct
        import zlib

        from tetraear_tpu.ui.waterfall import save_png
        rng = np.random.default_rng(7)
        rgb = rng.integers(0, 256, (9, 13, 3), dtype=np.uint8)
        p = tmp_path / "wf.png"
        save_png(p, rgb)
        d = p.read_bytes()
        assert d[:8] == b"\x89PNG\r\n\x1a\n"
        w, h, depth, ctype = struct.unpack(">IIBB", d[16:26])
        assert (w, h, depth, ctype) == (13, 9, 8, 2)
        # walk chunks to the IDAT payload
        off, idat = 8, b""
        while off < len(d):
            (ln,), tag = struct.unpack(">I", d[off:off + 4]), \
                d[off + 4:off + 8]
            if tag == b"IDAT":
                idat += d[off + 8:off + 8 + ln]
            off += 12 + ln
        raw = zlib.decompress(idat)
        assert len(raw) == 9 * (1 + 13 * 3)
        rows = [raw[r * 40 + 1:(r + 1) * 40] for r in range(9)]
        np.testing.assert_array_equal(
            np.frombuffer(b"".join(rows), np.uint8).reshape(9, 13, 3), rgb)


class TestSpikeBand:
    def test_finds_band_around_peak(self):
        freqs = np.linspace(392.0, 393.0, 1000)       # MHz, 1 kHz bins
        powers = np.full(1000, -90.0)
        c = 500
        powers[c - 12:c + 13] = -40.0                 # 25 kHz wide spike
        out = find_spike_band(freqs, powers, 392.5, 100e3)
        assert abs(out["center_mhz"] - 392.5) < 0.005
        assert 15000 <= out["bandwidth_hz"] <= 40000

    def test_fallback_on_empty(self):
        out = find_spike_band(np.array([]), np.array([]), 392.5, 100e3)
        assert out["bandwidth_hz"] == 25000.0


class TestAutoSpectrum:
    def test_targets_and_zoom(self):
        clock = FakeClock()
        cal = AutoSpectrumCalibration(clock=clock)
        freqs = np.linspace(391e6, 394e6, 2048)
        powers = np.full(2048, -90.0)
        powers[1000:1030] = -40.0
        out = cal.compute(freqs, powers)
        assert out is not None
        assert out["top_db"] >= -40
        assert out["bottom_db"] <= -90
        assert out["bottom_db"] < out["threshold_db"] < out["top_db"]
        assert out["zoom"] > 1.0                     # zooms toward the span

    def test_throttle(self):
        clock = FakeClock()
        cal = AutoSpectrumCalibration(clock=clock)
        freqs = np.linspace(0, 1e6, 64)
        powers = np.concatenate([np.full(32, -90.0), np.full(32, -40.0)])
        assert cal.compute(freqs, powers) is not None
        assert cal.compute(freqs, powers) is None    # throttled
        clock.t += 0.5
        assert cal.compute(freqs, powers) is not None

    def test_flat_spectrum_skipped(self):
        clock = FakeClock()
        cal = AutoSpectrumCalibration(clock=clock)
        assert cal.compute(np.arange(64.0), np.full(64, -80.0)) is None


class TestFollowFrequency:
    def test_steps_toward_peak(self):
        freqs = np.linspace(392.49, 392.51, 201)     # MHz
        powers = np.full(201, -90.0)
        powers[120] = -40.0                          # peak above center
        new = follow_frequency_step(freqs, powers, 392.5)
        assert new is not None
        offset = freqs[120] - 392.5
        np.testing.assert_allclose(new, 392.5 + offset * 0.1, rtol=1e-9)

    def test_weak_peak_ignored(self):
        freqs = np.linspace(392.49, 392.51, 201)
        powers = np.full(201, -90.0)
        powers[120] = -70.0                          # below -60 dB gate
        assert follow_frequency_step(freqs, powers, 392.5) is None

    def test_centered_peak_no_step(self):
        freqs = np.linspace(392.49, 392.51, 201)
        powers = np.full(201, -90.0)
        powers[100] = -40.0                          # exactly on center
        assert follow_frequency_step(freqs, powers, 392.5) is None


class TestStatusMachine:
    def test_lifecycle(self):
        clock = FakeClock()
        sm = TetraStatusMachine(clock=clock)
        assert sm.status()[0] == "none"
        sm.on_signal(True)
        assert sm.status()[0] == "none"              # no frames yet
        for _ in range(6):
            sm.on_frame({"burst_crc": True})
        assert sm.status()[0] == "analyzing"          # < 5 s window
        clock.t += 6.0
        state, msg = sm.status()
        assert state == "high_confidence"
        assert "Sync: 100%" in msg

    def test_signal_loss_resets(self):
        clock = FakeClock()
        sm = TetraStatusMachine(clock=clock)
        sm.on_signal(True)
        sm.on_frame({"burst_crc": True})
        sm.on_signal(False)
        assert sm.status()[0] == "none"
        assert sm.first_frame_time is None
