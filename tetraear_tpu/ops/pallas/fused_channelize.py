"""Fused multi-carrier DDC + decimating FIR as a Pallas TPU kernel.

The XLA path (ops/channelizer.py) materializes the mixed (C, N) complex
streams in HBM before the strided convolution reads them back.  This kernel
fuses the mixer into the filter: each grid program copies one overlapping
input window from HBM into VMEM, synthesizes the per-carrier oscillators
in-register, and computes the polyphase decimating FIR as banded matmuls
on the MXU.  HBM traffic for the mixed intermediates disappears.

Mosaic layout constraints (discovered empirically on TPU v5e — the
remote-compile helper returns no diagnostics, so these were bisected):
  * DMA windows from HBM need 128-aligned lane offsets and lengths, and
    power-of-two-ish sublane counts ((2, n*128) ok, (10, ...) not);
  * arbitrary reshapes that regroup lanes ((C, ext) -> (C, F, D)) do not
    lower; neither does dynamic_slice.

Design that satisfies them:
  * x travels as a (2, Npad) float32 array (re/im rows).  Window starts are
    i*TILE_IN with TILE_IN = TILE_M*D = 5120 = 40*128 (aligned); the
    filter's group delay G = 80 is folded into a host-side left pad so
    windows stay aligned; window length 5376 = 42*128.
  * decimation-FIR-as-matmul: y[m] = sum_q mixed[q] * S[q - m0*D, m - m0]
    with S[q', m'] = taps[m'*D + (L-1) - q'] — a banded selection-weight
    matrix.  TILE_M outputs are produced in 4 chunks of 128; each chunk
    reads an aligned 1536-lane input slice and multiplies one shared
    (1536, 128) weight matrix (identical across chunks because the chunk
    stride in q is 128*D).  Pure MXU work.
  * oscillator phase uses the global sample index, so chunked invocations
    stay phase-continuous.

Falls back to interpret mode off-TPU; matches channelizer.channelize
(zero-phase grid) to fp32 tolerance — see tests/unit/test_pallas_kernels.py.

STATUS: experimental, NOT wired into the default path.  Measured on TPU
v5e (16 carriers, 1.024 M samples): this kernel 2.88 ms vs the XLA conv
path 0.018 ms.  XLA already fuses the mixer into the strided conv and
exploits the band structure; the aligned banded-matmul formulation here
pays ~40x redundant MACs (zero band entries) and runs its DMA serially.
Kept as (a) working scaffolding for Pallas work on this backend with the
empirically-bisected Mosaic constraints documented above, and (b) the
starting point for a double-buffered per-phase variant if the channelizer
ever becomes the bottleneck (today the pipeline is dominated elsewhere).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_M = 512                  # output samples per carrier per grid step
_CHUNK = 128                  # outputs per banded-matmul chunk


def _kernel(start_ref, x_hbm, freq_ref, smat_ref, out_ref,
            *, decim: int, halo: int, win: int, sample_rate: float):
    i = pl.program_id(0)
    tile_in = TILE_M * decim
    in_chunk = _CHUNK * decim             # input stride between chunks
    band = smat_ref.shape[0]

    def body(xw, sem):
        copy = pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(i * tile_in, win)], xw, sem)
        copy.start()
        copy.wait()

        x = xw[...]                                   # (2, win)
        xr = x[0:1, :]
        xi = x[1:2, :]

        # oscillators on the global sample grid; window sample 0 is global
        # index start + i*tile_in - G
        base = start_ref[0] + i * tile_in - halo // 2
        t_idx = (base + jax.lax.broadcasted_iota(
            jnp.int32, (1, win), 1)).astype(jnp.float32)
        freqs = freq_ref[...]                         # (C, 1)
        ph = (-2.0 * np.pi / sample_rate) * freqs * t_idx
        osc_r = jnp.cos(ph)                           # (C, win)
        osc_i = jnp.sin(ph)
        mr = xr * osc_r - xi * osc_i                  # (C, win)
        mi = xr * osc_i + xi * osc_r

        smat = smat_ref[...]                          # (band, _CHUNK)
        for t in range(TILE_M // _CHUNK):
            q0 = t * in_chunk                         # 128-aligned
            o_r = jax.lax.dot_general(
                mr[:, q0:q0 + band], smat, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_i = jax.lax.dot_general(
                mi[:, q0:q0 + band], smat, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            out_ref[0, :, t * _CHUNK:(t + 1) * _CHUNK] = o_r
            out_ref[1, :, t * _CHUNK:(t + 1) * _CHUNK] = o_i

    pl.run_scoped(body,
                  pltpu.VMEM((2, win), jnp.float32),
                  pltpu.SemaphoreType.DMA(()))


@functools.lru_cache(maxsize=None)
def _band_matrix(num_taps: int, decim: int) -> np.ndarray:
    """S[q', m'] = taps[m'*decim + (num_taps-1) - q'] over the aligned band."""
    from tetraear_tpu.ops.fir import design_decimation_fir
    taps = design_decimation_fir(decim)
    assert len(taps) == num_taps
    raw = (_CHUNK - 1) * decim + num_taps
    band = -(-raw // 128) * 128
    s = np.zeros((band, _CHUNK), np.float32)
    for m in range(_CHUNK):
        for k in range(num_taps):
            q = m * decim + (num_taps - 1) - k
            if 0 <= q < band:
                s[q, m] = taps[k]
    return s


@functools.partial(jax.jit, static_argnames=("decim", "sample_rate",
                                             "halo", "win", "interpret"))
def _fused_channelize_ri(x_ri, freqs, smat, start_index, *, decim: int,
                         sample_rate: float, halo: int, win: int,
                         interpret: bool):
    n = x_ri.shape[1]
    c = freqs.shape[0]
    tile_in = TILE_M * decim
    num_tiles = n // tile_in
    g = halo // 2
    # left pad G keeps DMA windows 128-aligned while covering the halo;
    # right pad lets the final window read safely
    xp = jnp.pad(x_ri, ((0, 0), (g, win)))

    kernel = functools.partial(_kernel, decim=decim, halo=halo, win=win,
                               sample_rate=sample_rate)
    return pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((c, 1), lambda i: (0, 0)),
            pl.BlockSpec(smat.shape, lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((2, c, TILE_M), lambda i: (0, 0, i)),
        out_shape=jax.ShapeDtypeStruct((2, c, num_tiles * TILE_M),
                                       jnp.float32),
        interpret=interpret,
    )(start_index, xp, freqs, smat)


def fused_channelize(x: jnp.ndarray, offsets_hz, sample_rate: float,
                     decim: int, taps: np.ndarray,
                     start_index: int = 0) -> jnp.ndarray:
    """Drop-in for channelizer.channelize on tiling-friendly shapes.

    x: (N,) complex64 with N % (TILE_M*decim) == 0; `taps` must be the
    default design_decimation_fir(decim) (16*decim+1 taps — the band
    matrix is derived from that design).  Returns (C, N//decim) complex64.
    """
    n = x.shape[-1]
    tile_in = TILE_M * decim
    assert n % tile_in == 0, (n, tile_in)
    num_taps = len(taps)
    halo = num_taps - 1
    assert halo % 2 == 0 and (halo // 2) % decim == 0

    smat = _band_matrix(num_taps, decim)
    band = smat.shape[0]
    raw_win = (TILE_M - _CHUNK) * decim + band
    win = -(-raw_win // 128) * 128

    interpret = jax.default_backend() != "tpu"
    x_ri = jnp.stack([jnp.real(x), jnp.imag(x)], axis=0).astype(jnp.float32)
    freqs = jnp.asarray(offsets_hz, jnp.float32).reshape(-1, 1)
    out = _fused_channelize_ri(
        x_ri, freqs, jnp.asarray(smat),
        jnp.asarray([start_index], jnp.int32),
        decim=decim, sample_rate=float(sample_rate), halo=halo, win=win,
        interpret=interpret)
    return (out[0] + 1j * out[1]).astype(jnp.complex64)
