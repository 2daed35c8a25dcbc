#!/usr/bin/env python3
"""Head-to-head device timing of channelizer-conv formulations.

Each probe is one jitted program timed with sync-verified digest pulls
(utils/backend.pull_with_watchdog) at bench scale; the parent runs every
probe in its own child process so one backend failure cannot poison the
rest (CLAUDE.md rule 2).  Run in a healthy window (tools/tpu_health.py).

Probes:
  fused16        strided composite conv, 16 carriers (ops/fused.fused_channelize rotate=False)
  s2d16          space-to-depth stride-1 conv, 16 carriers (ops/fused.s2d_kernel)
  pfb96          strided modulated-conv PFB, 96 channels
  pfb96_s2d      space-to-depth PFB, 96 channels
  tail16 / tail96  deferred-rotation realpair demod tail alone on a (C, M) pair
  front16 / front96  conv + tail as dispatched (what bench tiers time, minus candidates)

Usage: python tools/tpu_conv_probe.py [--scale 8] [--iters 4] [--probe NAME]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402

PROBES = ("fused16", "pallas16", "pallas16_db", "pallas16_bf16",
          "pallas16_dt", "pallas16_dt_bf16",
          "pallas16_of4", "pallas16_of4_bf16",
          "pallas96", "pallas96_db", "pallas96_bf16",
          "s2d16", "s2d16_nwc", "s2d16_scanmm", "s2d16_scanmm_bf16",
          "s2d16_of4", "s2d16_of8", "s2d16_bf16", "s2d16_k4",
          "s2d16_n4", "s2d16_n8", "pfb96", "pfb96_s2d",
          "pfb96_s2d_bf16", "tail16", "tail96", "cand16", "cand96",
          "front16_s2d", "front96_s2d", "split16_s2d", "split16_of4",
          "split96_s2d", "crc96", "topk96", "wingather96",
          "candtopk96", "candgather96", "candgather96_oh", "candcrc96",
          "cand96_oh", "cand16_oh", "crc96_of4", "crc96_of4_bf16",
          "hbm1g", "hbm128m")

# kernel selection keys on the FIRST underscore token (see _build):
# suffix tokens broke "anywhere"-style selectors twice (of4/of8
# endswith-"16", then bf16 putting "16" into 96-channel names).  Assert
# every probe's first token carries exactly one carrier marker so a
# misrouted name cannot produce mislabeled measurements a third time.
# (hbm* are carrier-free device-ceiling probes — exempt.)
assert all(("96" in p.split("_")[0]) != ("16" in p.split("_")[0])
           for p in PROBES if not p.startswith("hbm")), PROBES


def _build(probe: str, scale: int):
    """-> (fn, args, n_samples): one jitted program + device inputs."""
    import jax
    import jax.numpy as jnp

    from tetraear_tpu.config import ReceiverConfig
    from tetraear_tpu.models.realpair import _demod_from_pair
    from tetraear_tpu.ops import fused
    from tetraear_tpu.utils.backend import put_complex

    cfg = ReceiverConfig()
    step = cfg.decimation_factor * cfg.ref_samples_per_symbol
    n = (8000 * step * scale // 96) * 96
    decim = cfg.decimation_factor
    sps = cfg.ref_samples_per_symbol
    cutoff = (cfg.channel_bandwidth_hz / 2) / (cfg.intermediate_rate_hz / 2)
    rng = np.random.default_rng(0)
    x = put_complex(((rng.standard_normal(n) + 1j * rng.standard_normal(n))
                     * 0.1).astype(np.complex64))

    # "96" in the FIRST underscore token selects the 96-channel PFB
    # kernel, else the 16-carrier kernel.  (Earlier selectors keyed on
    # markers anywhere in the name and were broken twice by suffixes:
    # of4/of8 endswith-"16", then the bf16 suffix putting "16" into
    # 96-channel names.  The first token carries exactly one marker —
    # asserted at startup above.)
    if "96" not in probe.split("_")[0]:
        offs = ((np.arange(16) - 8) * 25e3).astype(np.float64)
        kernel, gc, rot = fused.fused_kernel(
            offs, cfg.sample_rate_hz, decim, cfg.decim_fir_taps_per_phase,
            cfg.channel_fir_taps, cutoff)
    else:
        kernel, gc, rot = fused.pfb_kernel(96, cfg.sample_rate_hz)
    L = kernel.shape[-1]
    z_rot = fused.symbol_rotation(np.asarray(rot), decim, sps)

    if probe in ("fused16", "pfb96"):
        kd = jax.device_put(kernel)

        @jax.jit
        def fn(xc, k):
            yr, yi = fused.fused_channelize_ri(xc, k, gc, rot, decim,
                                               rotate=False)
            return jnp.sum(yr) + jnp.sum(yi)
        return (lambda: fn(x, kd)), n

    if probe in ("s2d16", "pfb96_s2d"):
        kd = jax.device_put(fused.s2d_kernel(kernel, decim))

        @jax.jit
        def fn(xc, k):
            yr, yi = fused.fused_channelize_s2d_ri(xc, k, gc, L, decim)
            return jnp.sum(yr) + jnp.sum(yi)
        return (lambda: fn(x, kd)), n

    if probe == "s2d16_nwc":
        # layout experiment: identical s2d conv but with the OUTPUT in
        # NWC (channels-last) — does the NCW output of _s2d_conv force
        # a relayout that is part of the 28 ms floor?
        from jax import lax
        kd = jax.device_put(fused.s2d_kernel(kernel, decim))
        lp = int(np.asarray(kd).shape[-1])
        pad_l = L - 1

        @jax.jit
        def fn_nwc(xc, k):
            nn = xc.shape[-1]
            m_out = -(-nn // decim)
            total = max((m_out + lp - 1) * decim,
                        -(-(pad_l + nn) // decim) * decim)
            xri = jnp.stack([jnp.real(xc), jnp.imag(xc)], axis=-1)
            xpad = jnp.pad(xri, ((pad_l, total - pad_l - nn), (0, 0)))
            x2 = xpad.reshape(1, total // decim, 2 * decim)
            out = lax.conv_general_dilated(
                x2, k, (1,), ((0, 0),),
                dimension_numbers=("NWC", "OIW", "NWC"),
                preferred_element_type=jnp.float32)[0]   # (W, 2C)
            return jnp.sum(out[:m_out])
        return (lambda: fn_nwc(x, kd)), n

    if probe in ("s2d16_scanmm", "s2d16_scanmm_bf16"):
        # explicit-GEMM formulation: scan over W-chunks, build the
        # im2col patch block from Lp STATIC slices (no gather), one
        # (2C, 2D*Lp) x (2D*Lp, CH) MXU matmul per chunk.  Tests
        # whether bypassing the backend's conv emitter reaches the MXU
        # (the XLA conv runs at ~2% MFU and bf16 gives no 2x).
        from jax import lax
        kd_np = np.asarray(fused.s2d_kernel(kernel, decim))
        c2k, ichk, lpk = kd_np.shape
        mmdt = jnp.bfloat16 if probe.endswith("bf16") else jnp.float32
        k3 = jax.device_put(jnp.asarray(
            kd_np.reshape(c2k, ichk * lpk), mmdt))
        CH = 16384

        @jax.jit
        def fn_scanmm(xc, kk):
            nn = xc.shape[-1]
            m_out = -(-nn // decim)
            pad_l = L - 1
            total = max((m_out + lpk - 1) * decim,
                        -(-(pad_l + nn) // decim) * decim)
            xri = jnp.stack([jnp.real(xc), jnp.imag(xc)], axis=-1)
            xpad = jnp.pad(xri, ((pad_l, total - pad_l - nn), (0, 0)))
            x2 = xpad.reshape(total // decim, 2 * decim).T.astype(mmdt)
            nch = m_out // CH

            def body(m0):
                sl = lax.dynamic_slice(
                    x2, (0, m0), (ichk, CH + lpk - 1))
                p = jnp.stack([sl[:, a:a + CH] for a in range(lpk)],
                              axis=1).reshape(ichk * lpk, CH)
                return jnp.sum(jnp.dot(
                    kk, p, preferred_element_type=jnp.float32))
            sums = lax.map(body, jnp.arange(nch, dtype=jnp.int32) * CH)
            return jnp.sum(sums)
        return (lambda: fn_scanmm(x, k3)), n

    if probe in ("pallas16_dt", "pallas16_dt_bf16"):
        # direct-tap Pallas conv: per-tap matmuls straight off the DMA
        # window, zero patch copies (ops/pallas/s2d_conv._kernel_direct)
        from tetraear_tpu.ops.pallas import s2d_conv as psc
        k2 = np.asarray(fused.s2d_kernel(kernel, decim))
        _c2d, ichd, lpd = k2.shape
        wkdd = jax.device_put(jnp.asarray(
            np.ascontiguousarray(k2.transpose(2, 0, 1))))
        dtb = probe.endswith("bf16")

        @jax.jit
        def fn_dt(xc, wk):
            out = psc.pallas_s2d_conv_dt_wk(xc, wk, gc, L, decim, ichd,
                                            lpd, bf16=dtb)
            return jnp.sum(out)
        return (lambda: fn_dt(x, wkdd)), n

    if probe in ("pallas16", "pallas16_db", "pallas16_bf16",
              "pallas96", "pallas96_db", "pallas96_bf16"):
        # MXU-mapped Pallas s2d conv (ops/pallas/s2d_conv.py): does the
        # hand-written GEMM formulation beat the ~VPU-floor XLA conv?
        # _db = pipeline-managed double-buffered window variant; 96 =
        # the full-band PFB kernel (192 output channels).
        from tetraear_tpu.ops.pallas import s2d_conv as psc
        variant = ("db" if probe.endswith("db")
                   else "bf16" if probe.endswith("bf16") else "dma")
        k2 = np.asarray(fused.s2d_kernel(kernel, decim))
        _c2, ich, lp = k2.shape
        wkd = jax.device_put(jnp.asarray(psc._group_weights(k2, decim)))

        @functools.partial(jax.jit, static_argnames=("v",))
        def fn_pallas(xc, wk, v):
            out = psc.pallas_s2d_conv_wk(xc, wk, gc, L, decim, ich, lp,
                                         variant=v)
            return jnp.sum(out)
        return (lambda: fn_pallas(x, wkd, variant)), n

    if probe in ("pallas16_of4", "pallas16_of4_bf16"):
        # output-folded Pallas conv: C2*4 = 128 output rows fill the MXU
        # and patch-copy bytes drop 4x per output position
        from tetraear_tpu.ops.pallas import s2d_conv as psc
        k2 = np.asarray(fused.s2d_kernel(kernel, decim))
        _c2, ich, lp = k2.shape
        wkd = jax.device_put(jnp.asarray(psc.of_group_weights(k2, decim,
                                                              4)))
        pbf16 = probe.endswith("bf16")

        @jax.jit
        def fn_pallas_of(xc, wk):
            out = psc.pallas_s2d_conv_of_wk(xc, wk, gc, L, decim, 4,
                                            ich, lp, bf16=pbf16)
            return jnp.sum(out)
        return (lambda: fn_pallas_of(x, wkd)), n

    if probe in ("s2d16_n4", "s2d16_n8"):
        # block-batched s2d conv: B independent blocks as the conv's N
        # dim in ONE dispatch — amortizes the measured 6-7 ms per-dispatch
        # overhead (VERDICT r2 #3 lever); same total samples as s2d16
        B = 4 if probe.endswith("n4") else 8
        kd = jax.device_put(fused.s2d_kernel(kernel, decim))
        nb = (n // B // decim) * decim

        @jax.jit
        def fn_batched(xc, k):
            xb = xc[:B * nb].reshape(B, nb)
            f = jax.vmap(lambda xx: fused.fused_channelize_s2d_ri(
                xx, k, gc, L, decim))
            yr, yi = f(xb)
            return jnp.sum(yr) + jnp.sum(yi)
        return (lambda: fn_batched(x, kd)), B * nb

    if probe == "s2d16_k4":
        # K-dim patch fold: 4 consecutive s2d tap positions stacked into
        # the input-channel dim (K = 4*2D = 80) so XLA sees matmul-like
        # contractions with a deeper K — probes whether the conv's ~29.5
        # ms floor is the VPU-lowered conv kernel (an MXU GEMM at K=80,
        # N=128 would beat it) at the cost of 4x input re-reads
        P = 4
        k2 = np.asarray(fused.s2d_kernel(kernel, decim))  # (2C, 2D, lp)
        lp = k2.shape[-1]
        lp_pad = -(-lp // P) * P
        k2 = np.pad(k2, ((0, 0), (0, 0), (0, lp_pad - lp)))
        # kernel regrouped: (2C, P*2D, lp_pad/P) — tap t = g*P + p reads
        # x2 row (m + t), i.e. group g reads patch rows (m + g*P + p)
        kg = k2.reshape(k2.shape[0], k2.shape[1], lp_pad // P, P)
        kg = np.transpose(kg, (0, 3, 1, 2)).reshape(
            k2.shape[0], P * k2.shape[1], lp_pad // P)
        kd = jax.device_put(jnp.asarray(kg))

        @jax.jit
        def fn_k4(xc, k):
            n_in = xc.shape[-1]
            m_out = -(-n_in // decim)
            pad_l = L - 1 - gc
            total = max((m_out + lp_pad - 1) * decim,
                        -(-(pad_l + n_in) // decim) * decim)
            xri = jnp.stack([jnp.real(xc), jnp.imag(xc)], axis=-1)
            xpad = jnp.pad(xri, ((pad_l, total - pad_l - n_in), (0, 0)))
            x2 = xpad.reshape(total // decim, 2 * decim)   # (W, 2D)
            # patch rows: x4[m, p*2D + c] = x2[m + p, c]
            W = x2.shape[0]
            x4 = jnp.concatenate(
                [x2[p:W - P + 1 + p] for p in range(P)], axis=-1)
            # kernel tap g reads x4[m + g*P] (rhs dilation restores the
            # original tap spacing across the P-folded patches)
            out = jax.lax.conv_general_dilated(
                x4[None], k, (1,), ((0, 0),),
                rhs_dilation=(P,),
                dimension_numbers=("NWC", "OIW", "NCW"),
                preferred_element_type=jnp.float32)[0][:, :m_out]
            return jnp.sum(out)
        return (lambda: fn_k4(x, kd)), n

    if probe in ("s2d16_of4", "s2d16_of8"):
        # output-folded s2d: fold consecutive output positions into the
        # channel dim so 2C*fold fills the MXU's 128 output lanes
        # (fold=4 -> exactly 128 for 16 carriers)
        fold = 4 if probe.endswith("of4") else 8
        kd = jax.device_put(fused.s2d_of_kernel(kernel, decim, fold))

        @jax.jit
        def fn(xc, k):
            yr, yi = fused.fused_channelize_s2d_of_ri(xc, k, gc, L, decim,
                                                      fold)
            return jnp.sum(yr) + jnp.sum(yi)
        return (lambda: fn(x, kd)), n

    if probe in ("s2d16_bf16", "pfb96_s2d_bf16"):
        # bf16 inputs/weights, f32 accumulation: 2x MXU rate + half the
        # HBM traffic.  Accuracy probe only — NOT a default path until
        # decision-level impact is measured under the SNR regression.
        kd = jax.device_put(fused.s2d_kernel(kernel, decim)
                            .astype(jnp.bfloat16))

        @jax.jit
        def fn(xc, k):
            xb = xc.astype(jnp.bfloat16)
            lp = k.shape[-1]
            n_in = xb.shape[-1]
            m_out = -(-n_in // decim)
            pad_l = L - 1 - gc
            total = max((m_out + lp - 1) * decim,
                        -(-(pad_l + n_in) // decim) * decim)
            xri = jnp.stack([jnp.real(xc).astype(jnp.bfloat16),
                             jnp.imag(xc).astype(jnp.bfloat16)], axis=-1)
            xpad = jnp.pad(xri, ((pad_l, total - pad_l - n_in), (0, 0)))
            x2 = xpad.reshape(1, total // decim, 2 * decim)
            out = jax.lax.conv_general_dilated(
                x2, k, (1,), ((0, 0),),
                dimension_numbers=("NWC", "OIW", "NCW"),
                preferred_element_type=jnp.float32)[0][:, :m_out]
            return jnp.sum(out)
        return (lambda: fn(x, kd)), n

    if probe in ("cand16", "cand96", "cand96_oh", "cand16_oh"):
        # the candidates+CRC program alone (the third dispatched stage);
        # _oh = gather-free one-hot window extraction (round-5).  Both
        # branches PIN the mode: the module default is backend-dependent
        # and would silently make cand96 == cand96_oh in an A/B
        if probe.endswith("_oh"):
            os.environ["TETRAEAR_CAND_GATHER"] = "onehot"
        else:
            os.environ["TETRAEAR_CAND_GATHER"] = "vmap"
        from tetraear_tpu.models.multicarrier import _candidates_compiled
        c = 16 if probe.startswith("cand16") else 96
        m = n // decim // sps
        b = 2 * (m - 1)
        bits = jax.device_put(jnp.asarray(
            rng.integers(0, 2, (c, b)).astype(np.uint8)))
        corr = jax.device_put(jnp.asarray(
            (rng.random((c, b - 21)) * 0.9).astype(np.float32)))
        count = jax.device_put(jnp.asarray(
            np.full(c, m, np.int32)))
        cand = _candidates_compiled(64, 0.80)

        @jax.jit
        def digestc(pos, ccorr, valid, frames, crc_ok):
            return (jnp.sum(ccorr) + jnp.sum(crc_ok.astype(jnp.float32))
                    + jnp.sum(valid.astype(jnp.float32)))

        def fn():
            return digestc(*cand(bits, corr, count))
        return fn, n

    if probe in ("candtopk96", "candgather96", "candgather96_oh",
                 "candcrc96"):
        # extract_candidates stage isolation at the PFB bench shape —
        # attribution INSIDE the current (hierarchical-topk + vmap
        # gather + windowed CRC) program, which cand96 measures whole
        from tetraear_tpu import constants as Cc
        from tetraear_tpu.ops.crc import soft_crc_check_batch
        c = 96
        m = n // decim // sps
        b = 2 * (m - 1)
        ncorr = b - 21
        bits = jax.device_put(jnp.asarray(
            rng.integers(0, 2, (c, b)).astype(np.uint8)))
        if probe == "candtopk96":
            corr = jax.device_put(jnp.asarray(
                (rng.random((c, ncorr)) * 0.9).astype(np.float32)))
            count = jax.device_put(jnp.asarray(np.full(c, m, np.int32)))

            @jax.jit
            def fn_htopk(cc, cnt):
                valid_bits = jnp.maximum(cnt - 1, 0) * 2
                pos_idx = jnp.arange(ncorr, dtype=jnp.int32)
                in_b = ((pos_idx >= Cc.SYNC_TO_FRAME_START_BITS)
                        & (pos_idx[None, :] - Cc.SYNC_TO_FRAME_START_BITS
                           + Cc.BITS_PER_SLOT <= valid_bits[..., None]))
                masked = jnp.where(in_b, cc, -1.0)
                seg = 128
                n_seg = -(-ncorr // seg)
                padded = jnp.pad(masked, ((0, 0),
                                          (0, n_seg * seg - ncorr)),
                                 constant_values=-1.0)
                segs = padded.reshape(c, n_seg, seg)
                seg_max = segs.max(axis=-1)
                seg_arg = segs.argmax(axis=-1).astype(jnp.int32)
                tc, ts_ = jax.lax.top_k(seg_max, 64)
                tp = ts_ * seg + jnp.take_along_axis(seg_arg, ts_,
                                                     axis=-1)
                return jnp.sum(tc) + jnp.sum(tp).astype(jnp.float32)
            return (lambda: fn_htopk(corr, count)), n
        start = jax.device_put(jnp.asarray(
            rng.integers(0, b - 510, (c, 64)).astype(np.int32)))
        if probe == "candgather96":
            @jax.jit
            def fn_vg(bb, st):
                win = st[..., None] + jnp.arange(Cc.BITS_PER_SLOT)[None, :]
                win = jnp.minimum(win, b - 1)
                frames = jax.vmap(lambda row, ww: row[ww])(bb, win)
                return jnp.sum(frames.astype(jnp.float32))
            return (lambda: fn_vg(bits, start)), n
        if probe == "candgather96_oh":
            from tetraear_tpu.models.multicarrier import _windows_onehot

            @jax.jit
            def fn_oh(bb, st):
                return jnp.sum(_windows_onehot(bb, st).astype(jnp.float32))
            return (lambda: fn_oh(bits, start)), n
        frames_h = np.asarray(
            rng.integers(0, 2, (c, 64, Cc.BITS_PER_SLOT))).astype(np.uint8)
        frames_d = jax.device_put(jnp.asarray(frames_h))

        @jax.jit
        def fn_wcrc(fr):
            data = jnp.concatenate(
                [fr[..., Cc.BURST_BLOCK1[0]:Cc.BURST_BLOCK1[1]],
                 fr[..., Cc.BURST_BLOCK2[0]:Cc.BURST_BLOCK2[1]]], axis=-1)
            return jnp.sum(soft_crc_check_batch(data).astype(jnp.float32))
        return (lambda: fn_wcrc(frames_d)), n

    if probe in ("front16_s2d", "front96_s2d"):
        kd = jax.device_put(fused.s2d_kernel(kernel, decim))

        @jax.jit
        def fn(xc, k):
            yr, yi = fused.fused_channelize_s2d_ri(xc, k, gc, L, decim)
            res = _demod_from_pair(yr, yi, sps, z_rot=z_rot)
            return jnp.sum(res.sync_corr) + res.count.sum().astype(
                jnp.float32)
        return (lambda: fn(x, kd)), n

    if probe in ("crc96", "crc96_of4", "crc96_of4_bf16", "topk96",
                 "wingather96"):
        # candidates-program sub-stages at PFB scale (96 x bench bits)
        from tetraear_tpu import constants as Cc
        from tetraear_tpu.ops.crc import soft_crc_dense
        c = 96
        m = n // decim // sps
        b = 2 * (m - 1)
        bits = jax.device_put(jnp.asarray(
            rng.integers(0, 2, (c, b)).astype(np.uint8)))
        corr = jax.device_put(jnp.asarray(
            (rng.random((c, b - 21)) * 0.9).astype(np.float32)))
        if probe.startswith("crc96"):
            # _of4[_bf16]: output-folded (132 MXU lanes) / bf16-input
            # dense CRC — bit-identical, round-5 kernel candidates
            cfold = 4 if "of4" in probe else 1
            cbf16 = probe.endswith("bf16")

            @jax.jit
            def fn_crc(bb):
                return jnp.sum(soft_crc_dense(
                    bb, fold=cfold, bf16=cbf16).astype(jnp.float32))
            return (lambda: fn_crc(bits)), n
        if probe == "topk96":
            @jax.jit
            def fn_topk(cc):
                v, i = jax.lax.top_k(cc, 64)
                return jnp.sum(v) + jnp.sum(i).astype(jnp.float32)
            return (lambda: fn_topk(corr)), n
        start = jax.device_put(jnp.asarray(
            rng.integers(0, b - 510, (c, 64)).astype(np.int32)))

        @jax.jit
        def fn_win(bb, st):
            win = st[..., None] + jnp.arange(Cc.BITS_PER_SLOT)[None, :]
            win = jnp.minimum(win, b - 1)
            frames = jnp.take_along_axis(
                jnp.broadcast_to(bb[..., None, :], (c, 64, b)), win,
                axis=-1)
            return jnp.sum(frames.astype(jnp.float32))
        return (lambda: fn_win(bits, start)), n

    if probe == "split16_of4":
        # output-folded conv + demod tail as two dispatched programs
        kd = jax.device_put(fused.s2d_of_kernel(kernel, decim, 4))

        @jax.jit
        def conv_prog_of(xc, k):
            return fused.fused_channelize_s2d_of_ri(xc, k, gc, L, decim, 4)

        @jax.jit
        def tail_prog_of(yr, yi):
            res = _demod_from_pair(yr, yi, sps, z_rot=z_rot)
            return jnp.sum(res.sync_corr) + res.count.sum().astype(
                jnp.float32)

        def fn():
            yr, yi = conv_prog_of(x, kd)
            return tail_prog_of(yr, yi)
        return fn, n

    if probe in ("split16_s2d", "split96_s2d"):
        # conv and demod tail as TWO dispatched programs: consecutive
        # blocks pipeline on the backend, so steady-state is set by the
        # slowest stage instead of their sum (cf. the demod/candidates
        # split that took the round-2 pipeline from 52.8 to 99.7 MS/s)
        kd = jax.device_put(fused.s2d_kernel(kernel, decim))

        @jax.jit
        def conv_prog(xc, k):
            return fused.fused_channelize_s2d_ri(xc, k, gc, L, decim)

        @jax.jit
        def tail_prog(yr, yi):
            res = _demod_from_pair(yr, yi, sps, z_rot=z_rot)
            return jnp.sum(res.sync_corr) + res.count.sum().astype(
                jnp.float32)

        def fn():
            yr, yi = conv_prog(x, kd)
            return tail_prog(yr, yi)
        return fn, n

    if probe in ("hbm1g", "hbm128m"):
        # HBM bandwidth at a size where dispatch is negligible.
        # ROOFLINE.md's "38.5 GB/s apparent" came from a 2x128 MB
        # elementwise probe whose ~6.6 ms runtime is the SAME order as
        # the 6.5 ms dispatch floor — i.e. it may measure dispatch, not
        # bandwidth.  1 GB in + 1 GB out at v5e's nominal 819 GB/s is
        # ~2.4 ms of genuine transfer; at 38.5 GB/s it is 52 ms — one
        # order of magnitude separates the hypotheses.
        nbytes = (1 << 30) if probe == "hbm1g" else (128 << 20)
        nel = nbytes // 4
        xb = jax.device_put(jnp.ones((nel,), jnp.float32))

        @jax.jit
        def fn_hbm(a):
            return a * 1.0001 + 1.0
        # ms_per_block here is ms per (read+write) pass of `nbytes`
        return (lambda: jnp.sum(fn_hbm(xb)[:8])), nel

    if probe in ("tail16", "tail96"):
        c = 16 if probe == "tail16" else 96
        m = n // decim
        yr = jax.device_put(jnp.asarray(
            (rng.standard_normal((c, m)) * 0.1).astype(np.float32)))
        yi = jax.device_put(jnp.asarray(
            (rng.standard_normal((c, m)) * 0.1).astype(np.float32)))
        zr = fused.symbol_rotation(np.asarray(rot)[:c], decim, sps)

        @jax.jit
        def fn(a, b):
            res = _demod_from_pair(a, b, sps, z_rot=zr)
            return jnp.sum(res.sync_corr) + res.count.sum().astype(
                jnp.float32)
        return (lambda: fn(yr, yi)), n

    raise ValueError(probe)


def _run_probe(probe: str, scale: int, iters: int, budget: float) -> dict:
    import jax
    from tetraear_tpu.utils.backend import pull_with_watchdog

    fn, n = _build(probe, scale)
    pull_with_watchdog(lambda: float(np.asarray(fn())), timeout_s=budget,
                       what=probe)                       # compile + sync
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn()
    v = pull_with_watchdog(lambda: float(np.asarray(out)),
                           timeout_s=budget, what=probe)
    dt = (time.perf_counter() - t0) / iters
    return {"ok": True, "probe": probe, "ms_per_block": round(dt * 1e3, 2),
            "ms_per_s": round(n / dt / 1e6, 1), "digest": v,
            "backend": jax.default_backend(), "n": n}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=8)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--budget", type=float, default=240.0)
    ap.add_argument("--probe", choices=PROBES)
    ap.add_argument("--child-timeout", type=float, default=600.0)
    args = ap.parse_args()

    if args.probe:
        try:
            # no-ops when a lock-holding parent spawned us; serializes a
            # hand-run --probe against other measurement jobs
            from tetraear_tpu.utils.backend import device_measure_lock
            with device_measure_lock():
                print(json.dumps(_run_probe(args.probe, args.scale,
                                            args.iters, args.budget)))
            sys.stdout.flush()
            os._exit(0)
        except Exception as e:
            print(json.dumps({"ok": False, "probe": args.probe,
                              "err": f"{type(e).__name__}: {str(e)[:140]}"}))
            sys.stdout.flush()
            os._exit(1)

    # serialize against bench.py / bench_watch on the single tunneled chip
    from tetraear_tpu.utils.backend import device_measure_lock
    lock = device_measure_lock()
    lock.__enter__()

    for p in PROBES:
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--probe", p,
                 "--scale", str(args.scale), "--iters", str(args.iters)],
                capture_output=True, text=True, timeout=args.child_timeout)
            line = (proc.stdout.strip().splitlines() or ["{}"])[-1]
            res = json.loads(line)
        except subprocess.TimeoutExpired:
            print(f"{p:12s} HANG (> {args.child_timeout:.0f}s) — tunnel "
                  "wedged, stopping", flush=True)
            return 1
        except (ValueError, json.JSONDecodeError):
            print(f"{p:12s} no result", flush=True)
            continue
        if res.get("ok"):
            print(f"{p:12s} {res['ms_per_block']:8.2f} ms/blk  "
                  f"{res['ms_per_s']:7.1f} MS/s  [{res['backend']}]",
                  flush=True)
        else:
            print(f"{p:12s} FAIL {res.get('err', '?')[:80]}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
