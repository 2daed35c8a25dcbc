"""IQ synthesis for tests, fixtures, and benchmarks.

The reference repo ships no recorded-IQ regression fixtures (SURVEY.md §4),
so conformance is anchored on synthesized signals with known bits.

Two transition mappings:

* ``pi4``  — true pi/4-DQPSK transitions {0:+pi/4, 1:+3pi/4, 2:-pi/4,
  3:-3pi/4} (ETSI Table 5.1).  NOTE: the reference demodulator's phase bins
  cannot round-trip this mapping (see ops/dqpsk.py quirk note).
* ``ref``  — transitions {0:0, 1:+pi/2, 2:-pi/2, 3:pi}, i.e. the centers of
  the reference's decision bins; a clean signal round-trips exactly through
  the ref-compat chain.  Used for planted-sync end-to-end goldens.
"""

from __future__ import annotations

import numpy as np

from tetraear_tpu import constants as C

_PI4_TRANSITIONS = np.array([np.pi / 4, 3 * np.pi / 4, -np.pi / 4, -3 * np.pi / 4])
_REF_TRANSITIONS = np.array([0.0, np.pi / 2, -np.pi / 2, np.pi])


def bits_to_symbols(bits: np.ndarray) -> np.ndarray:
    """Bit pairs (MSB first) -> dibit symbols 0..3."""
    bits = np.asarray(bits).astype(np.uint8) & 1
    assert bits.size % 2 == 0
    return (bits[0::2] << 1) | bits[1::2]


def synthesize_symbol_phasors(symbols: np.ndarray, mapping: str = "pi4",
                              phase0: float = 0.0) -> np.ndarray:
    """Differentially-encoded unit phasors, one per symbol plus the seed."""
    trans = _PI4_TRANSITIONS if mapping == "pi4" else _REF_TRANSITIONS
    phi = phase0 + np.concatenate([[0.0], np.cumsum(trans[np.asarray(symbols)])])
    return np.exp(1j * phi)


def upsample_hold(phasors: np.ndarray, sample_rate: float,
                  symbol_rate: float = C.SYMBOL_RATE_HZ) -> np.ndarray:
    """Nearest-symbol sample-and-hold to the capture rate (handles the
    non-integer 2.4e6/18e3 = 133.33 samples/symbol)."""
    n = int(round(len(phasors) * sample_rate / symbol_rate))
    sym_idx = np.minimum((np.arange(n) * symbol_rate / sample_rate).astype(int),
                         len(phasors) - 1)
    return phasors[sym_idx]


def synthesize_iq(symbols: np.ndarray, sample_rate: float = C.DEFAULT_SAMPLE_RATE_HZ,
                  freq_offset_hz: float = 0.0, snr_db: float | None = None,
                  mapping: str = "pi4", seed: int = 0) -> np.ndarray:
    """Full synthesis: symbols -> phasors -> upsample -> offset -> AWGN."""
    x = upsample_hold(synthesize_symbol_phasors(symbols, mapping), sample_rate)
    if freq_offset_hz:
        t = np.arange(len(x)) / sample_rate
        x = x * np.exp(2j * np.pi * freq_offset_hz * t)
    if snr_db is not None:
        rng = np.random.default_rng(seed)
        noise_std = 10 ** (-snr_db / 20) / np.sqrt(2)
        x = x + noise_std * (rng.standard_normal(len(x))
                             + 1j * rng.standard_normal(len(x)))
    return x.astype(np.complex64)


def make_frame_bits(payload_bits: np.ndarray | None = None,
                    seed: int = 0) -> np.ndarray:
    """A 510-bit slot with TS1 planted at bit offset 216 (the position the
    reference's sync-to-frame-start arithmetic expects, decoder.py:865).

    Burst layout per protocol.py:277-290: data block 1 = bits [0,108),
    training field bits [108,122) (first 14 bits of region), block 2 =
    [122,230).  We put TS1's 22 bits at [216,238) so find_sync lands
    exactly 216 bits into the slot.
    """
    rng = np.random.default_rng(seed)
    bits = rng.integers(0, 2, C.BITS_PER_SLOT).astype(np.uint8)
    if payload_bits is not None:
        payload_bits = np.asarray(payload_bits).astype(np.uint8)
        bits[:min(len(payload_bits), 108)] = payload_bits[:108]
    bits[216:238] = C.TS1
    return bits


def _uint_to_bits(val: int, n: int) -> np.ndarray:
    return np.array([(val >> (n - 1 - i)) & 1 for i in range(n)], dtype=np.uint8)


def make_mac_resource_frame_bits(payload: bytes, address: int = 0x1234,
                                 encrypted: bool = False, seed: int = 0,
                                 solve_crc: bool = True,
                                 encryption_mode: int | None = None
                                 ) -> np.ndarray:
    """A 510-bit slot carrying a parseable clear MAC-RESOURCE PDU with TS1
    planted at bit offset 216.

    Geometry note (reference quirk, SURVEY.md §7): the sync-to-frame-start
    arithmetic (decoder.py:865) puts TS1 at slot bits [216,238), which
    overlaps the burst's second data block [122,230) — so data bits 202..215
    (the last 14 CRC bits) are *forced* to TS1[0:14].  With ``solve_crc``,
    14 designated payload bits are solved over GF(2) so the computed CRC
    matches those forced bits, yielding a frame that passes the soft-CRC
    gate through the full chain; real reference captures only pass CRC when
    this coincidence happens by chance.
    """
    from tetraear_tpu.ops.crc import _crc_matrix, crc16_bits_arr

    if len(payload) > 20:
        raise ValueError("payload must fit the 6-bit length field margin")
    if encryption_mode is None:
        encryption_mode = 1 if encrypted else 0
    enc_bits = [(encryption_mode >> 1) & 1, encryption_mode & 1]
    head = np.concatenate([
        [0, 0], enc_bits, [0],
        _uint_to_bits(address, 24), _uint_to_bits(len(payload), 6),
        np.unpackbits(np.frombuffer(payload, np.uint8)) if payload else
        np.zeros(0, np.uint8)])
    return _golden_slot_from_head(head, seed, solve_crc)


def make_mac_end_frame_bits(part: bytes, encrypted: bool = False,
                            seed: int = 0,
                            solve_crc: bool = True) -> np.ndarray:
    """A 510-bit golden slot carrying a MAC-END PDU (type 11) that closes
    a fragmented message: 6-bit length + payload part.  Parser appends
    `part` to the fragment buffer opened by a MAC-RESOURCE and flushes the
    reassembled message (protocol.py:446-594 semantics,
    tetraear_tpu/protocol/parser.py MAC_END branch)."""
    if len(part) > 22:
        raise ValueError("END part must fit the data region")
    enc_bits = [0, 1] if encrypted else [0, 0]
    head = np.concatenate([
        [1, 1], enc_bits, [0], _uint_to_bits(len(part), 6),
        np.unpackbits(np.frombuffer(part, np.uint8)) if part else
        np.zeros(0, np.uint8)])
    return _golden_slot_from_head(head, seed, solve_crc)


def _golden_slot_from_head(head: np.ndarray, seed: int,
                           solve_crc: bool) -> np.ndarray:
    """Shared golden-slot assembly: random filler, GF(2) CRC solve against
    the TS1 overlay, burst-geometry placement (see
    make_mac_resource_frame_bits docstring for the geometry quirk)."""
    from tetraear_tpu.ops.crc import _crc_matrix, crc16_bits_arr

    rng = np.random.default_rng(seed)
    if head.size > 200:
        raise ValueError("payload too long for a single-slot golden frame")
    data = np.concatenate([head, rng.integers(0, 2, 200 - head.size)
                           .astype(np.uint8)])

    if solve_crc:
        # force crc(data)[2:16] == TS1[0:14] by solving for the last 14
        # filler bits over GF(2)
        free = np.arange(186, 200)
        if head.size > 186:
            free = np.arange(200 - 14, 200)
            if head.size > free[0]:
                raise ValueError("payload leaves no filler bits to solve CRC")
        A, c0 = _crc_matrix(200)
        target = np.asarray(C.TS1[:14], np.uint8)
        base = data.copy()
        base[free] = 0
        resid = (crc16_bits_arr(base)[2:16] ^ target) & 1
        sub = A[2:16][:, free] & 1            # (14, 14) GF(2) system
        x = _gf2_solve(sub, resid)
        if x is None:
            raise RuntimeError("CRC constraint system singular for this seed")
        data = base
        data[free] = x

    crc = crc16_bits_arr(data)
    full = np.concatenate([data, crc])         # 216 data bits incl. CRC
    slot = rng.integers(0, 2, C.BITS_PER_SLOT).astype(np.uint8)
    slot[0:108] = full[0:108]
    slot[108:122] = np.resize(C.TRAINING_SEQUENCES_14[1], 14)
    slot[122:230] = full[108:216]
    # sync overlay: TS1[0:14] == crc[2:16] by construction, so this is a
    # no-op on the data region and only sets the 8 tail bits [230,238)
    slot[216:238] = C.TS1
    return slot


def _gf2_solve(A: np.ndarray, b: np.ndarray):
    """Solve A x = b over GF(2) (square or overdetermined-consistent)."""
    A = (A.copy() & 1).astype(np.uint8)
    b = (b.copy() & 1).astype(np.uint8)
    n_rows, n_cols = A.shape
    x = np.zeros(n_cols, np.uint8)
    pivots = []
    row = 0
    for col in range(n_cols):
        sel = None
        for r in range(row, n_rows):
            if A[r, col]:
                sel = r
                break
        if sel is None:
            continue
        if sel != row:
            A[[row, sel]] = A[[sel, row]]
            b[[row, sel]] = b[[sel, row]]
        for r in range(n_rows):
            if r != row and A[r, col]:
                A[r] ^= A[row]
                b[r] ^= b[row]
        pivots.append((row, col))
        row += 1
        if row == n_rows:
            break
    if any(b[r] for r in range(row, n_rows)):
        return None
    for r, c in pivots:
        x[c] = b[r]
    return x


def make_stream_bits(num_frames: int = 4, lead_bits: int = 64,
                     seed: int = 0, golden: bool = False,
                     payload: bytes = b"HELLO HELLO") -> np.ndarray:
    """Concatenate frames with a random lead-in; sync hits land at
    lead_bits + 216 + k*510.  With ``golden`` the frames are CRC-valid
    MAC-RESOURCE slots (survive the decoder's strict discard)."""
    rng = np.random.default_rng(seed)
    lead = rng.integers(0, 2, lead_bits).astype(np.uint8)
    if golden:
        frames = [make_mac_resource_frame_bits(payload, seed=seed + 1 + k)
                  for k in range(num_frames)]
    else:
        frames = [make_frame_bits(seed=seed + 1 + k) for k in range(num_frames)]
    return np.concatenate([lead] + frames)


def bits_to_iq(bits: np.ndarray, sample_rate: float = C.DEFAULT_SAMPLE_RATE_HZ,
               mapping: str = "ref", freq_offset_hz: float = 0.0,
               snr_db: float | None = None, seed: int = 0) -> np.ndarray:
    """bits -> dibit symbols -> IQ at the capture rate."""
    return synthesize_iq(bits_to_symbols(bits), sample_rate,
                         freq_offset_hz, snr_db, mapping, seed)


def make_mac_block_bits(payload: bytes, address: int = 0x0ABC,
                        total_bits: int = 268, seed: int = 0,
                        encryption_mode: int = 0) -> np.ndarray:
    """A type-1 MAC-RESOURCE bit block for the etsi channel coder
    (SCH/F = 268 bits): header | 24-bit address | 6-bit length |
    payload bytes | random fill.  Unlike make_mac_resource_frame_bits this
    carries no reference-quirk CRC overlay — the etsi chain protects it
    with the real CRC-16 block code (ops/channel_coding.py).

    encryption_mode: the 2-bit MAC header field (0 = clear); callers
    passing an encrypted payload (crypto/tea.TEAEncryptor) set 1-3."""
    rng = np.random.default_rng(seed)
    head = np.concatenate([
        np.zeros(2, np.uint8),                      # pdu type = 00
        _uint_to_bits(encryption_mode, 2),
        np.zeros(1, np.uint8),                      # fill flag
        _uint_to_bits(address, 24), _uint_to_bits(len(payload), 6),
        np.unpackbits(np.frombuffer(payload, np.uint8)) if payload
        else np.zeros(0, np.uint8)])
    if head.size > total_bits:
        raise ValueError("payload too long for the block")
    fill = rng.integers(0, 2, total_bits - head.size).astype(np.uint8)
    return np.concatenate([head, fill])


def make_test_speech(seconds: float = 2.0, fs: int = 8000,
                     seed: int = 1) -> np.ndarray:
    """Voiced-speech-like int16 PCM: a swept pitch-pulse train through
    three formant resonators with syllable-rate amplitude modulation.

    Exercises every stage the real ACELP codec cares about (pitch
    tracking, LP spectrum, gain dynamics) without shipping recorded
    audio; used by the codec tests and `downlink --simulate` voice."""
    from scipy.signal import lfilter
    rng = np.random.default_rng(seed)
    n = int(fs * seconds)
    t = np.arange(n) / fs
    f0 = 100 + 40 * (t / max(t[-1], 1e-9))
    phase = np.cumsum(f0) / fs
    exc = (np.diff(np.floor(phase), prepend=0.0) > 0).astype(float)
    exc += 0.02 * rng.standard_normal(n)
    x = exc
    for f, bw in ((700, 130), (1220, 160), (2600, 300)):
        r = np.exp(-np.pi * bw / fs)
        th = 2 * np.pi * f / fs
        x = lfilter([1.0], [1.0, -2 * r * np.cos(th), r * r], x)
    x = x / (np.abs(x).max() + 1e-9) * 12000.0
    x *= 0.55 + 0.45 * np.sin(2 * np.pi * 2.5 * t) ** 2
    return x.astype(np.int16)
