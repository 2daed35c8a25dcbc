"""Bit-allocation self-check against the published EN 300 395-2 tables
(VERDICT r3 item 6): the spec's numbers are reproducible from the
literature even though the ETSI test vectors are not fetchable offline,
so pin every quantized parameter's width and the frame/block arithmetic.

Published TETRA ACELP allocation (EN 300 395-2 §5; widely reproduced,
e.g. ETSI TETRA codec overview papers): 137 bits / 30 ms frame =
  26 LSF + (8+5+8+5) pitch + 4 x (15 algebraic code + 6 gains) + 1 spare
and TCH/S channel coding (EN 300 395-3): 2 x 137 info bits per 432-bit
block, sensitivity classes per frame 51/56/30 (class 0/1/2), CRC-8 over
class 2, K=5 mother code with 4 tail bits, (103*i mod 432) interleaving.

The constants live in native/codec/tetra_codec.h; this test parses them
so editing the C without keeping the spec arithmetic intact fails CI.
"""

import re
from pathlib import Path

HEADER = (Path(__file__).resolve().parents[2]
          / "native" / "codec" / "tetra_codec.h")


def _defines() -> dict:
    text = HEADER.read_text().replace("\\\n", " ")   # join continuations
    exprs = {}
    for m in re.finditer(r"^#define\s+(\w+)\s+([^/\n]+?)\s*(?:/\*.*)?$",
                         text, re.M):
        exprs[m.group(1)] = m.group(2)
    out: dict = {}
    for _ in range(4):                     # resolve macro references
        for name, expr in exprs.items():
            if name in out:
                continue
            try:
                out[name] = int(eval(expr, {"__builtins__": {}}, out))
            except Exception:
                pass
    return out


def test_speech_frame_allocation_matches_spec():
    d = _defines()
    assert d["BITS_PER_FRAME"] == 137          # 4.567 kbit/s @ 30 ms
    assert d["LSF_BITS_TOTAL"] == 26
    assert d["PITCH_BITS_ABS"] == 8 and d["PITCH_BITS_REL"] == 5
    assert d["CODE_BITS"] == 15                # 3 pulses x 4b pos + 3 signs
    assert d["GAIN_BITS"] == 6
    pitch_total = 2 * d["PITCH_BITS_ABS"] + 2 * d["PITCH_BITS_REL"]
    per_subframe = d["CODE_BITS"] + d["GAIN_BITS"]
    assert (d["LSF_BITS_TOTAL"] + pitch_total + 4 * per_subframe
            == d["BITS_PER_FRAME"] - 1)        # +1 published spare bit


def test_frame_geometry_matches_spec():
    d = _defines()
    assert d["FRAME_N"] == 240                 # 30 ms @ 8 kHz
    assert d["SUBFRAMES"] == 4 and d["SUB_N"] == 60
    assert d["LP_ORDER"] == 10
    assert d["SERIAL_WORDS"] == 138            # BFI + 137 (exe contract)


def test_channel_block_allocation_matches_spec():
    d = _defines()
    assert d["TCH_S_BLOCK"] == 432             # EN 300 392-2 TCH/S block
    # class partition covers the whole frame
    assert (d["CLASS0_PER_FRAME"] + d["CLASS1_PER_FRAME"]
            + d["CLASS2_PER_FRAME"] == 137)
    assert (d["CLASS0_PER_FRAME"], d["CLASS1_PER_FRAME"],
            d["CLASS2_PER_FRAME"]) == (51, 56, 30)
    # convolutional input: protected classes of BOTH frames + CRC + tail
    assert d["CCH_CONV_IN"] == (2 * 56 + 2 * 30 + d["CCH_CRC_BITS"]
                                + d["CCH_TAIL_BITS"]) == 184
    # coded budget: class-0 bits ride uncoded; 8/12- and 8/18-punctured
    # class 1/2 fill the rest of the 432-bit block exactly
    assert d["CCH_CLASS1_CODED"] == 112 * 12 // 8 == 168
    assert d["CCH_CLASS2_CODED"] == 72 * 18 // 8 == 162
    assert (2 * d["CLASS0_PER_FRAME"] + d["CCH_CLASS1_CODED"]
            + d["CCH_CLASS2_CODED"] == 432)
    assert d["INTERLEAVE_A"] == 103            # b(i) = 103*i mod 432


def test_pitch_range_consistent():
    d = _defines()
    assert d["PIT_MIN"] == 20 and d["PIT_MAX"] == 143
    # 8-bit absolute index must cover the fractional + integer lag grid:
    # 3 fractions per lag below PIT_FR_MAX, integer lags above
    frac_lags = 3 * (d["PIT_FR_MAX"] - d["PIT_MIN"])
    int_lags = d["PIT_MAX"] - d["PIT_FR_MAX"] + 1
    assert frac_lags + int_lags <= 1 << d["PITCH_BITS_ABS"]
