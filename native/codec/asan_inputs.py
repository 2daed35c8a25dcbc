#!/usr/bin/env python3
"""Inputs for `make asan-check`: clean speech-like PCM plus hostile
codec files (noise-corrupted soft blocks, truncated/garbage .tet,
extreme serial words) — run from the asan-build directory."""
import numpy as np

fs = 8000
n = fs
rng = np.random.default_rng(4)
t = np.arange(n) / fs
x = (9000 * np.sin(2 * np.pi * 150 * t)
     * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))
     + 300 * rng.standard_normal(n)).astype(np.int16)
x.tofile("in.pcm")

# a valid coded block set to corrupt (built from deterministic bits so
# this script has no dependency on the built encoders)
blocks = rng.integers(-127, 128, (7, 690)).astype(np.int16)
blocks[:, 0] = 0x6B21
(blocks + rng.integers(-400, 400, blocks.shape).astype(np.int16)
 ).astype(np.int16).tofile("noisy.tet")
open("trunc.tet", "wb").write(blocks.tobytes()[:1000])
rng.integers(-32768, 32767, 5000).astype(np.int16).tofile("garbage.tet")
np.full(5 * 138, 0x7FFF, np.int16).tofile("extreme.serial")
print("asan inputs written")
