"""Interactive terminal UI: live spectrum + waterfall + frames/calls/
groups tables + SDS feed + voice playback, over the headless CaptureLoop.

This is the framework's interactive front-end — the terminal counterpart
of the reference's ModernTetraGUI (/root/reference/tetraear/ui/modern.py:
2518-5420: waterfall widget :649, tables :3200-3403, checkboxes
:2827-3199, audio-out :4137-4282).  Same information surfaces, same
toggles, no Qt: rendering is `rich` (Live + Layout), the waterfall is the
same WaterfallBuffer/colorize pipeline the PPM renderer uses (drawn with
half-block glyphs, two history rows per text row), and key presses flip
the reference's checkbox equivalents at runtime:

    a auto-decrypt   d denoiser   f follow-frequency (AFC retune)
    v hear-voice     r monitor-raw   q quit

All state lives in :class:`TuiState`, and `build_view` is a pure function
of it — the tests render frames headlessly through a recording console.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from tetraear_tpu.ui.session import SessionAggregator
from tetraear_tpu.ui.waterfall import (TetraStatusMachine, WaterfallBuffer,
                                       colorize, follow_frequency_step)

KEY_HELP = ("[b]a[/]uto-decrypt  [b]d[/]enoiser  [b]f[/]ollow-freq  "
            "[b]v[/]oice  [b]r[/]aw-monitor  [b]q[/]uit")


@dataclass
class TuiState:
    """Everything the view renders; mutated by CaptureLoop callbacks."""
    frequency_hz: float = 390.865e6
    status: str = "starting"
    status_color: str = "yellow"
    signal_power_db: Optional[float] = None
    auto_decrypt: bool = True
    denoise: bool = True
    follow_freq: bool = False
    hear_voice: bool = True
    monitor_raw: bool = False
    chunks: int = 0
    frames: int = 0
    voice_blocks: int = 0
    rate_msps: float = 0.0
    messages: List[str] = field(default_factory=list)
    rows: List[dict] = field(default_factory=list)   # recent frame rows
    waterfall: WaterfallBuffer = field(default_factory=WaterfallBuffer)
    session: SessionAggregator = field(default_factory=SessionAggregator)
    machine: TetraStatusMachine = field(default_factory=TetraStatusMachine)

    def on_frame_row(self, row: dict, max_rows: int = 64) -> None:
        self.rows.append(row)
        if len(self.rows) > max_rows:
            del self.rows[: len(self.rows) - max_rows]
        text = row.get("text")
        if text:
            self.messages.append(text)
            if len(self.messages) > 32:
                del self.messages[:-32]


# ---------------------------------------------------------------------------
# pure rendering
# ---------------------------------------------------------------------------

def _spectrum_sparkline(power_db: np.ndarray, width: int) -> str:
    """Downsample the latest spectrum row to a unicode column chart."""
    bars = " ▁▂▃▄▅▆▇█"
    if power_db is None or len(power_db) == 0 or width <= 0:
        return ""
    bins = np.array_split(np.asarray(power_db, float), width)
    vals = np.array([b.max() for b in bins])
    t = np.clip((vals + 100.0) / 80.0, 0.0, 1.0)
    idx = (t * (len(bars) - 1)).astype(int)
    return "".join(bars[i] for i in idx)


def _waterfall_lines(buffer: WaterfallBuffer, width: int, rows: int):
    """Render the newest 2*rows history lines as rich half-block markup,
    two spectral rows per text line (fg=upper px, bg=lower px)."""
    from rich.text import Text
    arr = buffer.as_array()
    if arr.size == 0 or width <= 0 or rows <= 0:
        return [Text("")]
    arr = arr[-2 * rows:]
    if arr.shape[0] % 2:
        arr = np.concatenate([arr[:1], arr])
    # downsample bins to the text width
    cols = np.array_split(np.arange(arr.shape[1]), width)
    ds = np.stack([arr[:, c].max(axis=1) for c in cols], axis=1)
    rgb = colorize(ds)
    out = []
    for r in range(0, rgb.shape[0], 2):
        t = Text()
        for x in range(rgb.shape[1]):
            fr, fg_, fb = (int(v) for v in rgb[r, x])
            br, bg_, bb = (int(v) for v in rgb[r + 1, x])
            t.append("▀", style=f"rgb({fr},{fg_},{fb}) on "
                               f"rgb({br},{bg_},{bb})")
        out.append(t)
    return out


def build_view(state: TuiState, width: int = 100):
    """TuiState -> rich renderable (pure; testable headlessly)."""
    from rich.console import Group
    from rich.layout import Layout
    from rich.panel import Panel
    from rich.table import Table
    from rich.text import Text

    status, color = state.machine.status()
    header = Text.assemble(
        (f" {state.frequency_hz / 1e6:.4f} MHz ", "bold white"),
        (f" {status} ", f"bold {color}"),
        (f" sig={state.signal_power_db:.1f} dB "
         if state.signal_power_db is not None else " sig=--- ", "cyan"),
        (f" chunks={state.chunks} frames={state.frames} "
         f"voice={state.voice_blocks} {state.rate_msps:.2f} MS/s ", "dim"),
        (f" [{'A' if state.auto_decrypt else '-'}"
         f"{'D' if state.denoise else '-'}"
         f"{'F' if state.follow_freq else '-'}"
         f"{'V' if state.hear_voice else '-'}"
         f"{'R' if state.monitor_raw else '-'}] ", "magenta"),
        (f" {state.status} ",
         "red" if state.status.startswith("ERROR") else "dim"),
    )

    spark = _spectrum_sparkline(state.waterfall.current_power, width - 4)
    wf_lines = _waterfall_lines(state.waterfall, width - 4, rows=8)
    spectrum_panel = Panel(Group(Text(spark, style="green"), *wf_lines),
                           title="spectrum / waterfall", padding=(0, 1))

    frames_t = Table(title="frames", expand=True, pad_edge=False)
    for col in ("#", "type", "crc", "enc", "text", "country"):
        frames_t.add_column(col, overflow="fold")
    for row in state.rows[-12:]:
        crc = row.get("crc")
        frames_t.add_row(
            str(row.get("number", "")), str(row.get("type_name", "")),
            "-" if crc is None else ("Y" if crc else "n"),
            ("dec" if row.get("decrypted")
             else "enc" if row.get("encrypted") else ""),
            (row.get("text") or "")[:40], row.get("country", ""))

    calls_t = Table(title="calls", expand=True, pad_edge=False)
    for col in ("talkgroup", "call", "type", "frames", "enc"):
        calls_t.add_column(col)
    for call in list(state.session.calls.values())[-8:]:
        calls_t.add_row(str(call.get("talkgroup")), str(call.get("call_id")),
                        str(call.get("type") or ""),
                        str(call.get("frames")),
                        "yes" if call.get("encrypted") else "")

    groups_t = Table(title="groups", expand=True, pad_edge=False)
    for col in ("talkgroup", "frames", "last type"):
        groups_t.add_column(col)
    for g in list(state.session.groups.values())[-8:]:
        groups_t.add_row(str(g.get("talkgroup")), str(g.get("frames")),
                         str(g.get("last_type") or ""))

    sds = Panel(Text("\n".join(state.messages[-6:]) or "(no messages)"),
                title="SDS", padding=(0, 1))
    footer = Text.from_markup(KEY_HELP, style="dim")

    layout = Layout()
    layout.split_column(
        Layout(header, name="header", size=1),
        Layout(spectrum_panel, name="spectrum", size=11),
        Layout(name="tables"),
        Layout(sds, name="sds", size=8),
        Layout(footer, name="footer", size=1),
    )
    layout["tables"].split_row(Layout(frames_t, ratio=2),
                               Layout(calls_t), Layout(groups_t))
    return layout


# ---------------------------------------------------------------------------
# interactive runner
# ---------------------------------------------------------------------------

class TerminalUI:
    """Wire a CaptureLoop to the live view + key toggles + audio out."""

    def __init__(self, loop, state: Optional[TuiState] = None,
                 audio_sink=None, refresh_hz: float = 8.0):
        self.loop = loop
        self.state = state or TuiState(frequency_hz=loop.frequency,
                                       auto_decrypt=loop.auto_decrypt,
                                       monitor_raw=loop.monitor_raw)
        self.audio = audio_sink
        self.refresh_hz = refresh_hz
        self._wire()

    def _wire(self) -> None:
        st, loop = self.state, self.loop

        def on_spectrum(freqs, power):
            st.waterfall.denoise = st.denoise
            st.waterfall.update_spectrum(np.asarray(freqs) / 1e6,
                                         np.asarray(power))
            st.chunks = loop.chunks_processed
            st.rate_msps = loop.meter.rates().get("samples_per_sec", 0.0) / 1e6
            if st.follow_freq and st.waterfall.current_freqs is not None:
                new = follow_frequency_step(
                    st.waterfall.current_freqs,
                    st.waterfall.current_power, loop.frequency / 1e6)
                if new is not None:
                    loop.set_frequency(new * 1e6)
                    st.frequency_hz = new * 1e6

        def on_frame(frame):
            st.machine.on_frame(frame)
            row = st.session.on_frame(frame)
            st.frames = loop.frames_decoded
            st.on_frame_row(row)

        def on_signal(freq, power):
            st.signal_power_db = power
            st.machine.on_signal(True)

        def on_voice(audio):
            st.voice_blocks += 1
            if st.hear_voice and self.audio is not None:
                self.audio.play(audio)

        loop.on_spectrum = on_spectrum
        loop.on_frame = on_frame
        loop.on_signal = on_signal
        loop.on_signal_lost = lambda: st.machine.on_signal(False)
        loop.on_voice_audio = on_voice
        loop.on_status = lambda msg: setattr(st, "status", msg)
        loop.on_error = lambda msg: setattr(st, "status", f"ERROR: {msg}")

    # -- key handling ------------------------------------------------------
    def handle_key(self, key: str) -> bool:
        """Apply one key toggle; returns False when the UI should quit."""
        st, loop = self.state, self.loop
        if key == "q":
            loop.stop(join=False)
            return False
        if key == "a":
            st.auto_decrypt = not st.auto_decrypt
            loop.auto_decrypt = st.auto_decrypt
            if loop.decoder is not None:
                loop.decoder.auto_decrypt = st.auto_decrypt
        elif key == "d":
            st.denoise = not st.denoise
        elif key == "f":
            st.follow_freq = not st.follow_freq
        elif key == "v":
            st.hear_voice = not st.hear_voice
        elif key == "r":
            st.monitor_raw = not st.monitor_raw
            loop.monitor_raw = st.monitor_raw
        return True

    def _key_thread(self, stop_event) -> None:
        import select
        import sys
        while not stop_event.is_set():
            r, _, _ = select.select([sys.stdin], [], [], 0.2)
            if r and not self.handle_key(sys.stdin.read(1)):
                stop_event.set()

    # -- main loop ----------------------------------------------------------
    def run(self, max_chunks: Optional[int] = None,
            duration_s: Optional[float] = None) -> None:
        import sys

        from rich.console import Console
        from rich.live import Live

        console = Console()
        stop = threading.Event()
        # cbreak setup/restore happens on THIS thread: a daemon key
        # thread's finally never runs at interpreter exit, which would
        # leave the user's shell without echo when the replay drains or
        # --duration expires (only a 'q' keypress would restore it)
        old_termios = None
        if sys.stdin.isatty():
            import termios
            import tty
            fd = sys.stdin.fileno()
            old_termios = termios.tcgetattr(fd)
            tty.setcbreak(fd)
            threading.Thread(target=self._key_thread, args=(stop,),
                             daemon=True).start()
        worker = threading.Thread(
            target=self.loop.run, kwargs={"max_chunks": max_chunks},
            daemon=True)
        worker.start()
        t0 = time.time()
        try:
            with Live(build_view(self.state, console.width),
                      console=console, screen=False,
                      refresh_per_second=self.refresh_hz) as live:
                while not stop.is_set():
                    time.sleep(1.0 / self.refresh_hz)
                    live.update(build_view(self.state, console.width))
                    if not worker.is_alive():
                        break
                    if (duration_s is not None
                            and time.time() - t0 > duration_s):
                        break
        finally:
            stop.set()
            if old_termios is not None:
                import termios
                termios.tcsetattr(sys.stdin.fileno(), termios.TCSADRAIN,
                                  old_termios)
            self.loop.stop(join=False)
            if self.audio is not None:
                kept = self.audio.close()
                if kept:
                    console.print(f"[dim]voice recording: {kept}[/]")
