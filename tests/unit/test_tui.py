"""Terminal UI (ui/tui.py) + audio playback (audio/playback.py): headless
rendering, CaptureLoop wiring, key toggles, and the WAV sink with its
silent-recording deletion (reference behaviors: modern.py:2827-3199
checkboxes, :4137-4282 audio out)."""

import wave

import numpy as np
import pytest

from tetraear_tpu.audio.playback import AudioSink
from tetraear_tpu.config import ReceiverConfig
from tetraear_tpu.io.replay import FileReplaySource
from tetraear_tpu.ui.capture_loop import CaptureLoop
from tetraear_tpu.ui.tui import TerminalUI, TuiState, build_view


@pytest.fixture(scope="module")
def fixture_iq(tmp_path_factory):
    from tetraear_tpu.io.replay import save_iq
    from tetraear_tpu.utils import synth
    stream = synth.make_stream_bits(num_frames=6, lead_bits=64, seed=2,
                                    golden=True)
    # tools/make_fixture.py recipe: ref-grid hold at 130 samples/symbol
    syms = synth.bits_to_symbols(stream)
    phasors = synth.synthesize_symbol_phasors(syms, mapping="ref")
    iq = synth.upsample_hold(phasors, 2.4e6, 2.4e6 / 130.0)
    path = tmp_path_factory.mktemp("iq") / "tui.cf32"
    save_iq(path, iq.astype(np.complex64), sample_rate=2.4e6,
            center_frequency=390.865e6)
    return str(path)


def _render_text(state, width=110):
    from rich.console import Console
    console = Console(record=True, width=width, force_terminal=True)
    console.print(build_view(state, width))
    return console.export_text()


class TestView:
    def test_empty_state_renders(self):
        txt = _render_text(TuiState())
        assert "MHz" in txt and "SDS" in txt and "uit" in txt

    def test_loop_to_view_end_to_end(self, fixture_iq):
        src = FileReplaySource(fixture_iq, sample_rate=2.4e6,
                               frequency=390.865e6)
        loop = CaptureLoop(src, always_decode=True, afc=False,
                           receiver_config=ReceiverConfig())
        ui = TerminalUI(loop, audio_sink=None)
        loop.run(max_chunks=4)
        # chunking loses edge-straddling frames (reference behavior);
        # 6 synthesized frames reliably yield several survivors
        assert loop.frames_decoded >= 2
        assert len(ui.state.rows) == loop.frames_decoded
        assert any("HELLO" in m for m in ui.state.messages)
        txt = _render_text(ui.state)
        assert "HELLO" in txt
        # waterfall/spectrum panel populated from on_spectrum
        assert ui.state.waterfall.as_array().size > 0


class TestKeys:
    def _ui(self):
        loop = CaptureLoop(source=None)
        return TerminalUI(loop)

    def test_toggles(self):
        ui = self._ui()
        st = ui.state
        before = (st.auto_decrypt, st.denoise, st.follow_freq,
                  st.hear_voice, st.monitor_raw)
        for key in "adfvr":
            assert ui.handle_key(key) is True
        after = (st.auto_decrypt, st.denoise, st.follow_freq,
                 st.hear_voice, st.monitor_raw)
        assert all(a != b for a, b in zip(after, before))
        assert ui.loop.auto_decrypt == st.auto_decrypt
        assert ui.loop.monitor_raw == st.monitor_raw

    def test_quit(self):
        ui = self._ui()
        assert ui.handle_key("q") is False
        assert ui.loop.running is False


class TestAudioSink:
    def test_wav_sink_records_and_keeps_loud(self, tmp_path):
        sink = AudioSink(record_dir=str(tmp_path), backend="wav-only")
        tone = 0.5 * np.sin(2 * np.pi * 440 *
                            np.arange(8000) / 8000).astype(np.float32)
        sink.play(tone)
        kept = sink.close()
        assert kept is not None and kept.exists()
        with wave.open(str(kept)) as w:
            assert w.getframerate() == 8000
            assert w.getnframes() == 8000

    def test_silent_recording_deleted(self, tmp_path):
        sink = AudioSink(record_dir=str(tmp_path), backend="wav-only")
        sink.play(np.zeros(4000, np.float32))
        assert sink.close() is None
        assert list(tmp_path.glob("*.wav")) == []

    def test_play_never_raises_without_recording(self):
        sink = AudioSink(backend="wav-only")
        sink.play(np.ones(100, np.float32))
        assert sink.close() is None

    def test_subprocess_backend_downgrades_on_failure(self, tmp_path,
                                                      monkeypatch):
        import tetraear_tpu.audio.playback as pb
        sink = AudioSink(record_dir=str(tmp_path), backend="aplay")

        def boom(*a, **k):
            raise FileNotFoundError("aplay")

        monkeypatch.setattr(pb.subprocess, "Popen", boom)
        sink.play(np.ones(100, np.float32) * 0.3)
        assert sink.backend == "wav-only"
        assert sink.close() is not None     # audio still landed in the WAV

    def test_persistent_pipe_backend(self, tmp_path, monkeypatch):
        """aplay backend streams blocks into ONE persistent player pipe
        (a per-block blocking run would stall the capture loop)."""
        import tetraear_tpu.audio.playback as pb

        class FakePipe:
            def __init__(self):
                import io
                self.stdin = io.BytesIO()
                self.killed = False

            def poll(self):
                return None

            def wait(self, timeout=None):
                return 0

        pipes = []

        def fake_popen(*a, **k):
            pipes.append(FakePipe())
            return pipes[-1]

        monkeypatch.setattr(pb.subprocess, "Popen", fake_popen)
        sink = AudioSink(backend="aplay")
        sink.play(np.ones(80, np.float32) * 0.3)
        sink.play(np.ones(80, np.float32) * 0.3)
        assert len(pipes) == 1               # one process, two writes
        assert len(pipes[0].stdin.getvalue()) == 2 * 80 * 2
        sink.close()


class TestMouse:
    """Reference mouse affordances carried to the terminal
    (modern.py:727-903): click-to-tune, Ctrl-click peak snap, wheel
    zoom with viewport clamping."""

    def _ui_with_spectrum(self, nbins=400, f0=390.0, f1=392.0):
        from tetraear_tpu.ui.tui import TerminalUI
        loop = CaptureLoop(source=None)
        ui = TerminalUI(loop)
        freqs = np.linspace(f0, f1, nbins)
        power = np.full(nbins, -90.0)
        power[240] = -40.0                     # a peak at ~391.2 MHz
        ui.state.waterfall.update_spectrum(freqs, power)
        ui.state.frequency_hz = 391.0e6
        return ui

    def test_parse_sgr_mouse(self):
        from tetraear_tpu.ui.tui import parse_sgr_mouse
        assert parse_sgr_mouse("\x1b[<0;34;5M") == (0, 34, 5, True)
        assert parse_sgr_mouse("\x1b[<16;10;4m") == (16, 10, 4, False)
        assert parse_sgr_mouse("\x1b[<64;1;3M") == (64, 1, 3, True)
        assert parse_sgr_mouse("\x1b[A") is None
        assert parse_sgr_mouse("q") is None

    def test_click_tunes_to_column_frequency(self):
        from tetraear_tpu.ui.tui import SPECTRUM_COL_FIRST
        ui = self._ui_with_spectrum()
        width = 104                             # content = 100 cols
        ui.handle_mouse(0, SPECTRUM_COL_FIRST + 50, 5, True, width=width)
        # middle of a 390-392 MHz span ~ 391 MHz
        assert abs(ui.state.frequency_hz / 1e6 - 391.0) < 0.02
        # retune is queued on the loop (applied at the next chunk)
        assert abs(ui.loop.pending_freq - ui.state.frequency_hz) < 1.0

    def test_ctrl_click_snaps_to_peak(self):
        from tetraear_tpu.ui.tui import SPECTRUM_COL_FIRST
        ui = self._ui_with_spectrum()
        width = 104
        # click near (but not on) the -40 dB peak at 391.2 MHz, Ctrl held
        col = SPECTRUM_COL_FIRST + 59          # ~391.19 MHz
        ui.handle_mouse(0 | 16, col, 5, True, width=width)
        assert abs(ui.state.frequency_hz / 1e6 - 391.2029) < 0.01

    def test_click_outside_spectrum_ignored(self):
        ui = self._ui_with_spectrum()
        before = ui.state.frequency_hz
        ui.handle_mouse(0, 50, 20, True, width=104)    # below the panel
        ui.handle_mouse(0, 1, 5, True, width=104)      # in the border
        assert ui.state.frequency_hz == before

    def test_wheel_zoom_and_viewport(self):
        from tetraear_tpu.ui.tui import SPECTRUM_COL_FIRST, view_slice
        ui = self._ui_with_spectrum()
        st = ui.state
        assert view_slice(st, 400) == slice(0, 400)
        ui.handle_mouse(64, SPECTRUM_COL_FIRST + 10, 5, True, width=104)
        assert st.zoom == 2.0 and st.view_center_mhz is not None
        sl = view_slice(st, 400)
        assert (sl.stop - sl.start) == 200 and sl.start >= 0
        # zoom clamps at 10x and at the span edges
        for _ in range(6):
            ui.handle_mouse(64, SPECTRUM_COL_FIRST, 5, True, width=104)
        assert st.zoom == 10.0
        sl = view_slice(st, 400)
        assert sl.start >= 0 and sl.stop <= 400
        # wheel down + reset
        ui.handle_mouse(65, SPECTRUM_COL_FIRST, 5, True, width=104)
        assert st.zoom == 5.0
        assert ui.handle_key("0") and st.zoom == 1.0

    def test_zoom_keys(self):
        ui = self._ui_with_spectrum()
        assert ui.handle_key("+") and ui.state.zoom == 2.0
        assert ui.handle_key("-") and ui.state.zoom == 1.0

    def test_zoomed_view_renders(self):
        ui = self._ui_with_spectrum()
        ui.handle_key("+")
        txt = _render_text(ui.state)
        assert "zoom 2x" in txt

    def test_max_zoom_on_wide_terminal_renders(self):
        # 10x zoom on a 400-bin spectrum leaves a 40-bin viewport; on a
        # 220-column terminal np.array_split used to yield empty chunks
        # whose .max() raised ValueError every refresh (ADVICE r4)
        ui = self._ui_with_spectrum()
        for _ in range(5):
            ui.handle_key("+")
        assert ui.state.zoom == 10.0
        txt = _render_text(ui.state, width=220)
        assert "zoom 10x" in txt


class TestFindPeakNear:
    def test_parabolic_interpolation(self):
        from tetraear_tpu.ui.waterfall import find_peak_near
        freqs = np.linspace(390.0, 392.0, 401)       # 5 kHz bins
        power = np.full(401, -90.0)
        power[200 - 1:200 + 2] = (-50.0, -45.0, -50.0)   # symmetric peak
        got = find_peak_near(freqs, power, 391.0, window_mhz=0.05)
        assert abs(got - 391.0) < 1e-6               # delta = 0
        power[201] = -46.0                           # skew right
        got = find_peak_near(freqs, power, 391.0, window_mhz=0.05)
        assert 391.0 < got < 391.005
        assert find_peak_near(freqs, power, 380.0, window_mhz=0.01) is None
