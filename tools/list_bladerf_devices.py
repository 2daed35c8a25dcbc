#!/usr/bin/env python3
"""CLI device enumeration (tool parity with
tetraear/tools/list_bladerf_devices.py)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tetraear_tpu.ui.cli import cmd_devices  # noqa: E402

if __name__ == "__main__":
    raise SystemExit(cmd_devices(None))
