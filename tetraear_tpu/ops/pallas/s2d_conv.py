"""Space-to-depth composite conv as an MXU-mapped Pallas kernel.

WHY: the XLA lowering of the s2d composite conv (ops/fused._s2d_conv)
is VPU-bound on this backend — ROOFLINE.md measured ~1.35 TF/s
sustained (1.6 % of the chip's 82 TF/s matmul peak) and the rate is
invariant under dtype/K-depth/N-batch/output-fold shaping, i.e. XLA
never engages the systolic array for this conv shape.  This kernel
states the same contraction as explicit (C2, 128) x (128, TILE_W)
matmuls so the MXU does the FLOPs:

    out[c, w] = sum_{i, a} K2[c, i, a] * X2[w + a, i]

with the (i, a) contraction split into groups of TPG taps x BLK
channel-rows = 128 MXU input lanes.  Patch matrices are built in VMEM
from lane-shifted slices of one DMA'd input window — no gather, no
reshape that regroups lanes (both are documented Mosaic no-gos on this
backend, see ops/pallas/fused_channelize.py).

Layout contract (chosen for the empirically-working DMA pattern —
windows with power-of-two sublane counts and 128-aligned lane extents):
  * input  x2T: (32, W) f32 — s2d channel rows [j*D + r re/im-major]
    in sublanes (20 real rows for D=10, rows 20..31 zero), decimated
    positions in lanes.  The host wrapper builds this with one XLA
    transpose of the free (N, 2) -> (W, 2D) reshape.
  * weights wk: (G, C2, 128) f32 — wk[g, c, a*BLK + i] = K2[c, i, g*TPG + a]
    (i >= 2D rows zero), so each group's matmul contracts 128 lanes of
    which TPG*2D = 100 are useful (78 % MXU feed efficiency).
  * output: (C2, m_out) f32 — the (2C, M) block-row layout the demod
    tail consumes; written tile-contiguous, no output-side transpose.

Decision equivalence: bit-level f32 differences vs _s2d_conv are
possible (different contraction split); tests pin max-abs agreement to
fp32 tolerance and decision-level equality through the demod tail.

STATUS: interpret-mode verified vs ops/fused._s2d_conv; device
measurement pending a healthy TPU window (tools/tpu_conv_probe.py
--probe pallas16).  Wire into the frontends only after a verified win.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_W = 2048         # default output positions per grid step (round-5
                      # device sweep: 23.77/23.04/22.34/22.31 ms at
                      # 512/1024/2048/4096 — identical digests; 2048
                      # takes the amortization win at 1/2 the VMEM of
                      # 4096; full tier 315->335 MS/s)
BLK = 24              # sublane block per tap (multiple of 8; >= 2D)
TPG = 128 // BLK      # taps per 128-lane group (5 for BLK=24)
SUBLANES = 32         # DMA window sublane count (power of two)


def _tile_w() -> int:
    """Grid tile width (output positions per step).  Env-overridable
    for device sweeps: the per-tile costs that do NOT scale with the
    tile (DMA start/wait latency, grid step, patch-copy issue
    overhead) are paid num_tiles times, so larger tiles amortize them
    — bounded by VMEM (window + patch + accumulator ~ a few hundred KB
    at 2048)."""
    import os
    return int(os.environ.get("TETRAEAR_PALLAS_TILE_W", TILE_W))


def _kernel(x_hbm, wk_ref, out_ref, *, g_groups: int, win: int, c2: int,
            dtype=jnp.float32, blk: int = BLK, tpg: int = TPG,
            sub: int = SUBLANES, tile_w: int = TILE_W):
    out_dtype = out_ref.dtype
    i = pl.program_id(0)

    def body(xw, pg, sem):
        copy = pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(i * tile_w, win)], xw, sem)
        copy.start()
        copy.wait()

        # rows blk*tpg..128 of the patch are never written by the loop;
        # zero them once so 0-weight columns never meet garbage VMEM
        # (0 * NaN would poison the accumulator)
        if blk * tpg < 128:
            pg[blk * tpg:128, :] = jnp.zeros((128 - blk * tpg, tile_w),
                                             dtype)
        acc = jnp.zeros((c2, tile_w), jnp.float32)
        for g in range(g_groups):
            # patch rows a*blk..a*blk+blk = input rows 0..blk at lane
            # shift g*tpg + a (rows >= ich are zero padding; the matching
            # weight columns are zero, so they contribute nothing)
            for a in range(tpg):
                off = g * tpg + a
                pg[a * blk:(a + 1) * blk, :] = xw[0:blk, off:off + tile_w]
            acc = acc + jax.lax.dot_general(
                wk_ref[g], pg[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        out_ref[...] = acc.astype(out_dtype)

    pl.run_scoped(body,
                  pltpu.VMEM((sub, win), dtype),
                  pltpu.VMEM((128, tile_w), dtype),
                  pltpu.SemaphoreType.DMA(()))


def _kernel_direct(x_hbm, wk_ref, out_ref, *, lp: int, win: int, c2: int,
                   ich: int, dtype, sub: int, tile_w: int):
    """Per-tap matmul variant: NO patch scratch, no lane-shifted VMEM
    copies — each tap contributes a (c2, ich) x (ich, tile_w) matmul
    whose RHS is a lane-offset slice of the DMA'd window, read directly
    as an MXU operand.  Trades 128-lane contraction efficiency
    (ich=20 of 128) for zero VPU shuffle work; which side wins is a
    device measurement (pallas16_dt probes)."""
    i = pl.program_id(0)

    def body(xw, sem):
        copy = pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(i * tile_w, win)], xw, sem)
        copy.start()
        copy.wait()
        acc = jnp.zeros((c2, tile_w), jnp.float32)
        for t in range(lp):
            acc = acc + jax.lax.dot_general(
                wk_ref[t], xw[0:ich, t:t + tile_w],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        out_ref[...] = acc

    pl.run_scoped(body,
                  pltpu.VMEM((sub, win), dtype),
                  pltpu.SemaphoreType.DMA(()))


@functools.partial(jax.jit, static_argnames=("lp", "win", "c2", "ich",
                                             "num_tiles", "interpret",
                                             "bf16", "sub", "tile_w"))
def _run_direct(x2t, wkd, *, lp: int, win: int, c2: int, ich: int,
                num_tiles: int, interpret: bool, bf16: bool,
                sub: int = SUBLANES, tile_w: int = TILE_W):
    dtype = jnp.bfloat16 if bf16 else jnp.float32
    if bf16:
        x2t = x2t.astype(dtype)
        wkd = wkd.astype(dtype)
    kern = functools.partial(_kernel_direct, lp=lp, win=win, c2=c2,
                             ich=ich, dtype=dtype, sub=sub, tile_w=tile_w)
    return pl.pallas_call(
        kern,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),             # x2t in HBM
            pl.BlockSpec((lp, c2, ich), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((c2, tile_w), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((c2, num_tiles * tile_w),
                                       jnp.float32),
        interpret=interpret,
    )(x2t, wkd)


def _kernel_db(xa_ref, xb_ref, wk_ref, out_ref, pg, *, g_groups: int,
               c2: int):
    """Double-buffered variant: the input window arrives as two
    pipeline-managed VMEM blocks (tile i and tile i+1 of the same HBM
    array via two BlockSpecs), so Mosaic's automatic grid pipelining
    overlaps the next tiles' DMA with this tile's matmuls — the manual
    start/wait in _kernel runs its DMA serially with compute.  Costs a
    second fetch of each block (every block arrives once as `xa`, once
    as `xb`); wins if MXU time dominates DMA time."""
    xw = jnp.concatenate([xa_ref[...], xb_ref[:, :128]], axis=1)
    pg[BLK * TPG:128, :] = jnp.zeros((128 - BLK * TPG, TILE_W), jnp.float32)
    acc = jnp.zeros((c2, TILE_W), jnp.float32)
    for g in range(g_groups):
        for a in range(TPG):
            off = g * TPG + a
            pg[a * BLK:(a + 1) * BLK, :] = xw[0:BLK, off:off + TILE_W]
        acc = acc + jax.lax.dot_general(
            wk_ref[g], pg[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    out_ref[...] = acc


@functools.partial(jax.jit, static_argnames=("g_groups", "c2", "num_tiles",
                                             "interpret"))
def _run_db(x2t, wk, *, g_groups: int, c2: int, num_tiles: int,
            interpret: bool):
    assert g_groups * TPG <= 128, g_groups   # halo must fit xb's 128 lanes
    kern = functools.partial(_kernel_db, g_groups=g_groups, c2=c2)
    return pl.pallas_call(
        kern,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((SUBLANES, TILE_W), lambda i: (0, i)),
            pl.BlockSpec((SUBLANES, TILE_W), lambda i: (0, i + 1)),
            pl.BlockSpec((g_groups, c2, 128), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((c2, TILE_W), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((c2, num_tiles * TILE_W),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((128, TILE_W), jnp.float32)],
        interpret=interpret,
    )(x2t, x2t, wk)


def _group_weights(k2: np.ndarray, decim: int) -> np.ndarray:
    """s2d kernel (C2, 2D, Lp) -> grouped (G, C2, 128) MXU weights."""
    c2, ich, lp = k2.shape
    assert ich <= BLK, (ich, BLK)
    g_groups = -(-lp // TPG)
    wk = np.zeros((g_groups, c2, 128), np.float32)
    for g in range(g_groups):
        for a in range(TPG):
            t = g * TPG + a
            if t < lp:
                wk[g, :, a * BLK:a * BLK + ich] = k2[:, :, t]
    return wk


@functools.partial(jax.jit, static_argnames=("g_groups", "win", "c2",
                                             "num_tiles", "interpret",
                                             "bf16", "blk", "tpg", "sub",
                                             "tile_w", "out_bf16"))
def _run(x2t, wk, *, g_groups: int, win: int, c2: int, num_tiles: int,
         interpret: bool, bf16: bool = False, blk: int = BLK,
         tpg: int = TPG, sub: int = SUBLANES, tile_w: int = TILE_W,
         out_bf16: bool = False):
    dtype = jnp.bfloat16 if bf16 else jnp.float32
    if bf16:
        x2t = x2t.astype(dtype)
        wk = wk.astype(dtype)
    kern = functools.partial(_kernel, g_groups=g_groups, win=win, c2=c2,
                             dtype=dtype, blk=blk, tpg=tpg, sub=sub,
                             tile_w=tile_w)
    out_dt = jnp.bfloat16 if out_bf16 else jnp.float32
    return pl.pallas_call(
        kern,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),             # x2t in HBM
            pl.BlockSpec((g_groups, c2, 128), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((c2, tile_w), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((c2, num_tiles * tile_w),
                                       out_dt),
        interpret=interpret,
    )(x2t, wk)


def pallas_s2d_conv_wk(x: jnp.ndarray, wk: jnp.ndarray, gc: int, L: int,
                       decim: int, ich: int, lp: int,
                       variant: str = "dma") -> jnp.ndarray:
    """Traceable core: x (N,) complex64 + PRE-GROUPED weights wk
    (G, C2, 128) from _group_weights -> (C2, m_out) f32.  ich/lp are the
    original s2d kernel's (in-channels, taps) — static ints.  variant:
    'dma' = one manual window DMA per tile (serial with compute);
    'db' = pipeline-managed dual-block windows (auto double buffering,
    each block fetched twice);
    'bf16' = 'dma' with bf16 patches/weights and f32 MXU accumulation —
    2x matmul throughput AND half the patch-copy bytes, so it wins in
    either bottleneck regime; tolerance pinned by test_bf16_variant."""
    c2 = wk.shape[1]
    n = x.shape[-1]
    m_out = -(-n // decim)
    pad_l = L - 1 - gc

    tile_w = TILE_W if variant == "db" else _tile_w()
    num_tiles = -(-m_out // tile_w)
    g_groups = -(-lp // TPG)
    raw_win = tile_w + g_groups * TPG - 1
    win = -(-raw_win // 128) * 128

    # lanes the last tile reads: (num_tiles-1)*tile_w + win for the DMA
    # variant; the db variant reads block num_tiles (one tile past)
    w_pad = max((num_tiles - 1) * tile_w + win, (num_tiles + 1) * tile_w)
    total = w_pad * decim
    xri = jnp.stack([jnp.real(x), jnp.imag(x)], axis=-1)      # (N, 2)
    xpad = jnp.pad(xri, ((pad_l, total - pad_l - n), (0, 0)))
    x2 = xpad.reshape(w_pad, 2 * decim)                       # free reshape
    x2t = jnp.pad(x2.T, ((0, SUBLANES - ich), (0, 0)))        # (32, W)

    interpret = jax.default_backend() != "tpu"
    if variant == "db":
        out = _run_db(x2t, wk, g_groups=g_groups, c2=c2,
                      num_tiles=num_tiles, interpret=interpret)
    else:
        out = _run(x2t, wk, g_groups=g_groups, win=win, c2=c2,
                   num_tiles=num_tiles, interpret=interpret,
                   bf16=(variant in ("bf16", "bf16h")),
                   out_bf16=(variant == "bf16h"), tile_w=tile_w)
    return out[:, :m_out]


def pallas_s2d_conv_dt_wk(x: jnp.ndarray, wkd: jnp.ndarray, gc: int,
                          L: int, decim: int, ich: int, lp: int,
                          bf16: bool = False) -> jnp.ndarray:
    """Direct-tap traceable core: x (N,) complex64 + per-tap weights
    wkd (Lp, C2, ich) = k2.transpose(2, 0, 1) -> (C2, m_out) f32.
    See _kernel_direct."""
    c2 = wkd.shape[1]
    n = x.shape[-1]
    m_out = -(-n // decim)
    pad_l = L - 1 - gc

    tile_w = _tile_w()
    num_tiles = -(-m_out // tile_w)
    raw_win = tile_w + lp - 1
    win = -(-raw_win // 128) * 128
    w_pad = (num_tiles - 1) * tile_w + win
    total = w_pad * decim
    xri = jnp.stack([jnp.real(x), jnp.imag(x)], axis=-1)      # (N, 2)
    xpad = jnp.pad(xri, ((pad_l, total - pad_l - n), (0, 0)))
    x2 = xpad.reshape(w_pad, 2 * decim)                       # free reshape
    x2t = jnp.pad(x2.T, ((0, SUBLANES - ich), (0, 0)))        # (32, W)

    interpret = jax.default_backend() != "tpu"
    out = _run_direct(x2t, wkd, lp=lp, win=win, c2=c2, ich=ich,
                      num_tiles=num_tiles, interpret=interpret,
                      bf16=bf16, tile_w=tile_w)
    return out[:, :m_out]


def of_group_weights(k2: np.ndarray, decim: int, fold: int) -> np.ndarray:
    """Output-folded grouped weights: plain s2d kernel (C2, 2D, Lp) ->
    (G, C2*fold, 128) MXU weights for the stride-1 view of the stride-
    `fold` of conv (see pallas_s2d_conv_of_wk).

    Derivation: with K3[c*F+r, i, a2] = K2[c, i, a2-r] (the of kernel,
    ops/fused.s2d_of_kernel) and the free input regroup
    X2f[wf, rf*2D+i] = X2[wf*F+rf, i], splitting a2 = af*F + rf gives

        out_of[cf, wf] = sum_{af, q} K3f[cf, q, af] X2f[wf+af, q],
        K3f[cf, rf*2D + i, af] = K3[cf, i, af*F + rf]

    — a stride-1 s2d conv with ich' = 2D*F input channels and
    lp' = ceil((Lp+F-1)/F) taps, grouped here exactly like
    _group_weights (blk' = ich' rows per tap, tpg' = 128//blk')."""
    c2, ich, lp = k2.shape
    # 128-lane constraint (same reason as the 'ich <= BLK' guard on the
    # plain path): the folded input channels must fit one MXU block, or
    # tpg = 128 // blk below is 0 and the grouping math divides by zero
    if ich * fold > 128:
        raise ValueError(
            f"of_group_weights: ich*fold = {ich}*{fold} = {ich * fold} "
            "> 128 MXU lanes; lower the fold for this decimation")
    la = lp + fold - 1
    k3 = np.zeros((c2, fold, ich, la), np.float32)
    for r in range(fold):
        k3[:, r, :, r:r + lp] = k2
    k3 = k3.reshape(c2 * fold, ich, la)                  # (C2F, 2D, La)
    ich_of = ich * fold
    lp_of = -(-la // fold)
    k3p = np.zeros((c2 * fold, ich, lp_of * fold), np.float32)
    k3p[:, :, :la] = k3
    # [cf, i, af, rf] -> [cf, rf*2D + i, af]
    k3f = np.ascontiguousarray(
        k3p.reshape(c2 * fold, ich, lp_of, fold).transpose(0, 3, 1, 2)
    ).reshape(c2 * fold, ich_of, lp_of)
    blk = -(-ich_of // 8) * 8
    tpg = 128 // blk
    g_groups = -(-lp_of // tpg)
    wk = np.zeros((g_groups, c2 * fold, 128), np.float32)
    for g in range(g_groups):
        for a in range(tpg):
            t = g * tpg + a
            if t < lp_of:
                wk[g, :, a * blk:a * blk + ich_of] = k3f[:, :, t]
    return wk


def pallas_s2d_conv_of_wk(x: jnp.ndarray, wk: jnp.ndarray, gc: int,
                          L: int, decim: int, fold: int, ich: int,
                          lp: int, bf16: bool = False) -> jnp.ndarray:
    """Output-folded traceable core: x (N,) complex64 + of_group_weights
    wk (G, C2*fold, 128) -> (C2, m_out) f32, same contraction as
    pallas_s2d_conv_wk but with `fold` consecutive output positions
    folded into MXU output rows (C2*fold fills all 128 output lanes for
    the 16-carrier C2=32, fold=4) and fold x fewer patch-copy bytes per
    output position.  ich/lp are the ORIGINAL s2d kernel's dims."""
    c2f = wk.shape[1]
    c2 = c2f // fold
    n = x.shape[-1]
    m_out = -(-n // decim)
    pad_l = L - 1 - gc
    wr = -(-m_out // fold)

    ich_of = ich * fold
    lp_of = -(-(lp + fold - 1) // fold)
    blk = -(-ich_of // 8) * 8
    tpg = 128 // blk
    sub = max(32, 1 << (blk - 1).bit_length())           # pow2 >= blk
    g_groups = -(-lp_of // tpg)
    tile_w = _tile_w()
    num_tiles = -(-wr // tile_w)
    raw_win = tile_w + g_groups * tpg - 1
    win = -(-raw_win // 128) * 128

    w_pad = (num_tiles - 1) * tile_w + win               # X2f rows read
    total = w_pad * fold * decim
    xri = jnp.stack([jnp.real(x), jnp.imag(x)], axis=-1)      # (N, 2)
    xpad = jnp.pad(xri, ((pad_l, total - pad_l - n), (0, 0)))
    x2f = xpad.reshape(w_pad, ich_of)                    # free reshape
    x2t = jnp.pad(x2f.T, ((0, sub - ich_of), (0, 0)))    # (sub, W')

    interpret = jax.default_backend() != "tpu"
    out = _run(x2t, wk, g_groups=g_groups, win=win, c2=c2f,
               num_tiles=num_tiles, interpret=interpret, bf16=bf16,
               blk=blk, tpg=tpg, sub=sub, tile_w=tile_w)
    # un-fold: (C2*F, wr) -> (C2, wr*F); rows c*F+r hold position w*F+r
    out = out[:, :wr].reshape(c2, fold, wr).transpose(0, 2, 1)
    return out.reshape(c2, wr * fold)[:, :m_out]


def pallas_s2d_conv(x: jnp.ndarray, kernel_s2d, gc: int, L: int,
                    decim: int, variant: str = "dma") -> jnp.ndarray:
    """Drop-in for ops/fused._s2d_conv: (N,) complex64 -> (2C, m_out) f32
    un-derotated channel pair rows (block order [re.., im..]).
    variant 'of4'/'of4_bf16' = output-folded (fold=4)."""
    k2 = np.asarray(kernel_s2d)
    c2, ich, lp = k2.shape
    assert ich == 2 * decim, (ich, decim)
    if variant.startswith("of"):
        fold = int(variant.split("_")[0][2:])
        wk = jnp.asarray(of_group_weights(k2, decim, fold))
        return pallas_s2d_conv_of_wk(x, wk, gc, L, decim, fold, ich, lp,
                                     bf16=variant.endswith("bf16"))
    if variant.startswith("dt"):
        wkd = jnp.asarray(np.ascontiguousarray(k2.transpose(2, 0, 1)))
        return pallas_s2d_conv_dt_wk(x, wkd, gc, L, decim, ich, lp,
                                     bf16=variant.endswith("bf16"))
    assert ich <= BLK, (ich, decim)
    wk = jnp.asarray(_group_weights(k2, decim))
    return pallas_s2d_conv_wk(x, wk, gc, L, decim, ich, lp, variant=variant)
