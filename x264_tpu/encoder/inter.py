"""P-frame encoding: batched motion search + MC + transform, no wavefront.

Reference analogues: x264_me_search_ref (me.c:182, HEX), mb_analyse_inter_*
(analyse.c:1255+), P-skip (macroblock.c:1129, mvpred.c:166), median MV
prediction (mvpred.c:30). TPU re-design:

  * Inter prediction reads the *reference* frame, not the current recon, so
    every stage is a whole-frame batched tensor op — no wavefront at all.
  * The final MV of every MB equals its motion-search MV (a skipped MB is
    only skipped when its MV already equals the P-Skip predictor), so the
    MV field is final right after the batched search and median predictors /
    skip predictors / MVDs are computed as shifted-gather tensor ops instead
    of the reference's sequential per-MB cache.
  * The hex/UMH-style search runs as unrolled rounds of 6-point candidate
    evaluation over all MBs at once (data-dependent iteration counts become
    fixed rounds with converged lanes re-evaluating — SURVEY.md §7.3.6).

Round-1 scope: P_L0_16x16 + P_Skip, one reference, full+half+quarter-pel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..entropy import nal as nal_mod
from ..entropy.slice_hdr import slice_header_write
from ..ops import dct, mc, quant
from ..ops.tables import chroma_qp
from .encoder import TYPE_IDR
from .intra import (_chroma_blocks, _chroma_merge, _luma_blocks, _luma_merge,
                    _mb_tiles, CAP_BYTES_PER_MB)

# hex pattern (reference me.c:344) and square refine offsets, in full-pel
_HEX = np.array([(-2, 0), (-1, 2), (1, 2), (2, 0), (1, -2), (-1, -2)],
                dtype=np.int32)
_SQUARE = np.array([(-1, -1), (0, -1), (1, -1), (-1, 0), (1, 0),
                    (-1, 1), (0, 1), (1, 1)], dtype=np.int32)
_DIA_Q = np.array([(-1, 0), (1, 0), (0, -1), (0, 1)], dtype=np.int32)


def _mv_cost_bits(mvd):
    """Approximate rate of an MV component (se golomb length)."""
    v = jnp.abs(mvd)
    nbits = jnp.zeros_like(v)
    for k in range(1, 16):
        nbits = nbits + ((2 * v + 1) >= (1 << k))
    return 2 * nbits - 1


def _sad_at(padded_ref, src, x0, y0, mv_fp):
    blk = mc.fullpel_block(padded_ref, x0, y0, mv_fp, 16)
    return jnp.sum(jnp.abs(blk - src.astype(jnp.int32)), axis=(-2, -1))


def _satd_qpel(hpel, src, x0, y0, mv_q):
    blk = mc.luma_mc_block(hpel, x0, y0, mv_q, 16)
    d = blk - src.astype(jnp.int32)
    dd = d.reshape(-1, 4, 4, 4, 4).swapaxes(2, 3).reshape(-1, 16, 4, 4)
    h = jnp.asarray(np.array([[1, 1, 1, 1], [1, -1, 1, -1],
                              [1, 1, -1, -1], [1, -1, -1, 1]], np.int32))
    t = jnp.einsum("ij,...jk,lk->...il", h, dd, h,
                   preferred_element_type=jnp.int32)
    return jnp.sum(jnp.abs(t), axis=(1, 2, 3)) >> 1


def motion_search(padded_ref, hpel, y_src, lam, me_range: int,
                  fp_rounds: int = 8):
    """Batched HEX + square + subpel refine. Returns mv [N, 2] (qpel units).

    y_src [H, W]; cost = SAD/SATD + lam * mvbits(mv) (zero-centred rate
    bias; exact MVD rate needs the predictor, applied later)."""
    H, W = y_src.shape
    mbh, mbw = H // 16, W // 16
    n = mbh * mbw
    tiles = _mb_tiles(y_src, 16).reshape(n, 16, 16)
    x0 = (jnp.arange(n, dtype=jnp.int32) % mbw) * 16
    y0 = (jnp.arange(n, dtype=jnp.int32) // mbw) * 16

    mv = jnp.zeros((n, 2), jnp.int32)              # full-pel during search
    best = _sad_at(padded_ref, tiles, x0, y0, mv) \
        + lam * (_mv_cost_bits(mv[:, 0]) + _mv_cost_bits(mv[:, 1]))

    def eval_offsets(mv, best, offsets):
        for k in range(offsets.shape[0]):
            cand = mv + jnp.asarray(offsets[k])[None, :]
            cand = jnp.clip(cand, -me_range, me_range)
            c = _sad_at(padded_ref, tiles, x0, y0, cand) \
                + lam * (_mv_cost_bits(cand[:, 0])
                         + _mv_cost_bits(cand[:, 1]))
            better = c < best
            mv = jnp.where(better[:, None], cand, mv)
            best = jnp.where(better, c, best)
        return mv, best

    for _ in range(fp_rounds):
        mv, best = eval_offsets(mv, best, _HEX)
    mv, best = eval_offsets(mv, best, _SQUARE)

    # subpel: start from full-pel in qpel units, two diamond rounds at
    # half then quarter step (reference refine_subpel me.c:865)
    mvq = mv * 4
    bestq = _satd_qpel(hpel, tiles, x0, y0, mvq) \
        + lam * (_mv_cost_bits(mvq[:, 0]) + _mv_cost_bits(mvq[:, 1]))
    for step in (2, 1):
        for k in range(4):
            cand = mvq + jnp.asarray(_DIA_Q[k])[None, :] * step
            cand = jnp.clip(cand, -me_range * 4, me_range * 4)
            c = _satd_qpel(hpel, tiles, x0, y0, cand) \
                + lam * (_mv_cost_bits(cand[:, 0])
                         + _mv_cost_bits(cand[:, 1]))
            better = c < bestq
            mvq = jnp.where(better[:, None], cand, mvq)
            bestq = jnp.where(better, c, bestq)
    return mvq


def mv_predictors(mv_field):
    """Median MV predictor + P-Skip predictor per MB (spec 8.4.1.1/8.4.1.3).

    mv_field [mbh, mbw, 2] — final MVs, all ref0 P16x16.
    Returns (mvp [mbh,mbw,2], pskip_mv [mbh,mbw,2])."""
    mbh, mbw = mv_field.shape[:2]
    z = jnp.zeros((1, mv_field.shape[1], 2), mv_field.dtype)

    def shift(field, dx, dy):
        f = field
        if dy:
            f = jnp.concatenate([jnp.zeros_like(f[:dy]), f[:-dy]], axis=0)
        if dx > 0:
            f = jnp.concatenate([jnp.zeros_like(f[:, :dx]), f[:, :-dx]],
                                axis=1)
        elif dx < 0:
            f = jnp.concatenate([f[:, -dx:], jnp.zeros_like(f[:, :(-dx)])],
                                axis=1)
        return f

    mv_a = shift(mv_field, 1, 0)       # left
    mv_b = shift(mv_field, 0, 1)       # top
    mv_c = shift(mv_field, -1, 1)      # top-right
    mv_d = shift(mv_field, 1, 1)       # top-left
    col = jnp.arange(mbw)[None, :, None]
    row = jnp.arange(mbh)[:, None, None]
    avail_a = col > 0
    avail_b = row > 0
    avail_c = (row > 0) & (col < mbw - 1)
    avail_d = (row > 0) & (col > 0)
    # C unavailable -> substitute D (spec 8.4.1.3.2)
    mv_c = jnp.where(avail_c, mv_c, jnp.where(avail_d, mv_d, 0))
    avail_c2 = avail_c | avail_d
    # all-inter-ref0 world: refIdx matches availability
    a = jnp.where(avail_a, mv_a, 0)
    b = jnp.where(avail_b, mv_b, 0)
    c = jnp.where(avail_c2, mv_c, 0)
    med = jnp.clip(a, jnp.minimum(b, c), jnp.maximum(b, c))  # median of 3
    # exactly-one-match rule: with single ref, match == availability
    n_match = (avail_a.astype(jnp.int32) + avail_b.astype(jnp.int32)
               + avail_c2.astype(jnp.int32))
    only = jnp.where(avail_a, a, jnp.where(avail_b, b, c))
    mvp = jnp.where(n_match == 1, only, med)
    # B and C unavailable & A available -> mvA (spec note)
    mvp = jnp.where((~avail_b) & (~avail_c2) & avail_a, a, mvp)
    # P-skip predictor (spec 8.4.1.1): zero if an edge MB or a zero-MV
    # ref0 neighbor, else the median predictor
    azero = jnp.all(mv_a == 0, axis=-1, keepdims=True)
    bzero = jnp.all(mv_b == 0, axis=-1, keepdims=True)
    pskip = jnp.where((~avail_a) | (~avail_b), 0,
                      jnp.where(azero | bzero, 0, mvp))
    return mvp, pskip


@partial(jax.jit, static_argnames=("mbw", "mbh", "cap_words", "me_range"))
def encode_pframe_device(y, u, v, ref_y_pad, ref_hpel, ref_u_pad, ref_v_pad,
                         qp_mb, qpc_mb, lam, *, mbw, mbh, cap_words,
                         me_range):
    """Fused P-frame device pass: ME -> MVP/skip -> MC -> transform ->
    entropy -> packed payload. Returns (words, total_bits, recon, stats)."""
    from ..entropy.cavlc_jax import encode_pframe_entropy_dev
    H, W = y.shape
    n = mbw * mbh
    mvq = motion_search(ref_y_pad, ref_hpel, y, lam, me_range)
    mv_field = mvq.reshape(mbh, mbw, 2)
    mvp, pskip = mv_predictors(mv_field)
    mvd = (mv_field - mvp).reshape(n, 2)

    # --- MC + transform (batched) ---
    x0 = (jnp.arange(n, dtype=jnp.int32) % mbw) * 16
    y0 = (jnp.arange(n, dtype=jnp.int32) // mbw) * 16
    pred_y = mc.luma_mc_block(ref_hpel, x0, y0, mvq, 16)
    src_y = _mb_tiles(y, 16).reshape(n, 16, 16)
    qp = qp_mb.reshape(-1)
    res = src_y.astype(jnp.int32) - pred_y
    blocks = _luma_blocks(res)
    w = dct.dct4x4(blocks)
    lv = quant.quant4x4(w, qp[:, None], intra=False)
    dq = quant.dequant4x4(lv, qp[:, None])
    recon_y_mb = jnp.clip(pred_y + _luma_merge(dct.idct4x4(dq)), 0, 255)

    # --- chroma ---
    cx0 = x0 // 2
    cy0 = y0 // 2
    qpc = qpc_mb.reshape(-1)
    out_c = []
    for plane_pad, src_pl in ((ref_u_pad, u), (ref_v_pad, v)):
        pred_c = mc.chroma_mc_block(plane_pad, cx0, cy0, mvq, 8)
        src_c = _mb_tiles(src_pl, 8).reshape(n, 8, 8)
        res_c = src_c.astype(jnp.int32) - pred_c
        cblocks = _chroma_blocks(res_c)
        wc = dct.dct4x4(cblocks)
        dcs = wc[:, :, 0, 0].reshape(-1, 2, 2)
        had = dct.hadamard2x2(dcs)
        dc_lv = quant.quant2x2_dc(had, qpc, intra=False)
        ac_lv = quant.quant4x4(wc, qpc[:, None], intra=False)
        ac_lv = ac_lv.at[:, :, 0, 0].set(0)
        f = dct.ihadamard2x2(dc_lv)
        dc_vals = quant.dequant2x2_dc(f, qpc)
        d = quant.dequant4x4(ac_lv, qpc[:, None])
        d = d.at[:, :, 0, 0].set(dc_vals.reshape(-1, 4))
        rec_c = jnp.clip(pred_c + _chroma_merge(dct.idct4x4(d)), 0, 255)
        out_c.append((dc_lv, ac_lv, rec_c, pred_c))
    (udc, uac, urec, upred), (vdc, vac, vrec, vpred) = out_c

    # --- skip decision ---
    nnz_l = jnp.sum(lv.reshape(n, 16, 16) != 0, axis=2)
    cbp_bits = []
    for qd in range(4):
        qy, qx = qd // 2, qd % 2
        idx = [(2 * qy + by) * 4 + (2 * qx + bx)
               for by in range(2) for bx in range(2)]
        qnnz = sum(nnz_l[:, i] for i in idx)
        cbp_bits.append((qnnz > 0).astype(jnp.int32) << qd)
    cbp_luma = sum(cbp_bits)
    nnz_cac = jnp.sum(uac.reshape(n, 4, 16) != 0, axis=2) \
        + jnp.sum(vac.reshape(n, 4, 16) != 0, axis=2)
    any_cac = (jnp.sum(jnp.sum(uac.reshape(n, 4, 16) != 0, axis=2), axis=1)
               + jnp.sum(jnp.sum(vac.reshape(n, 4, 16) != 0, axis=2),
                         axis=1)) > 0
    any_cdc = (jnp.sum(udc.reshape(n, 4) != 0, axis=1)
               + jnp.sum(vdc.reshape(n, 4) != 0, axis=1)) > 0
    cbp_chroma = jnp.where(any_cac, 2, jnp.where(any_cdc, 1, 0))
    mv_is_pskip = jnp.all(mv_field.reshape(n, 2)
                          == pskip.reshape(n, 2), axis=1)
    skip = (cbp_luma == 0) & (cbp_chroma == 0) & mv_is_pskip

    # skipped MBs have zero residual by construction (cbp==0), recon = pred
    # --- assemble recon planes ---
    def merge_plane(mb_tensor, s, hh, ww):
        return mb_tensor.reshape(hh // s, ww // s, s, s) \
            .swapaxes(1, 2).reshape(hh, ww)
    recon_y = merge_plane(recon_y_mb, 16, H, W).astype(jnp.uint8)
    recon_u = merge_plane(urec, 8, H // 2, W // 2).astype(jnp.uint8)
    recon_v = merge_plane(vrec, 8, H // 2, W // 2).astype(jnp.uint8)

    words, total_bits = encode_pframe_entropy_dev(
        skip, mvd, cbp_luma, cbp_chroma, qp,
        lv.reshape(n, 16, 4, 4),
        jnp.stack([udc.reshape(n, 2, 2), vdc.reshape(n, 2, 2)], axis=1),
        jnp.stack([uac.reshape(n, 4, 4, 4), vac.reshape(n, 4, 4, 4)],
                  axis=1),
        mbw=mbw, mbh=mbh, cap_words=cap_words)
    stats = {"skip": jnp.sum(skip), "mv_field": mv_field}
    return words, total_bits, (recon_y, recon_u, recon_v), stats


def encode_pframe(enc, planes, ftype, qp):
    """Host orchestration for one P frame."""
    if enc.p.cabac:
        raise NotImplementedError("CABAC lands later; use --no-cabac")
    if not enc._dpb:
        raise RuntimeError("P frame without reference")
    mbw, mbh = enc.mb_w, enc.mb_h
    ref = enc._dpb[-1]
    y, u, v = [jnp.asarray(p) for p in planes]
    qp_mb = jnp.full((mbh, mbw), qp, jnp.int32)
    qpc_mb = jnp.asarray(
        chroma_qp(np.full((mbh, mbw), qp), enc.p.analyse.chroma_qp_offset),
        jnp.int32)
    lam = int(round(0.85 * 2 ** ((qp - 12) / 3.0) ** 0.5))  # ~lambda(qp)
    lam = max(1, lam)
    cap_words = (mbw * mbh * CAP_BYTES_PER_MB) // 4
    me_range = min(enc.p.analyse.me_range, mc.PAD - 20)
    words, total_bits, recon, stats = encode_pframe_device(
        y, u, v, ref["y_pad"], ref["hpel"], ref["u_pad"], ref["v_pad"],
        qp_mb, qpc_mb, lam, mbw=mbw, mbh=mbh, cap_words=cap_words,
        me_range=me_range)

    from ..entropy.bits import append_bitstring
    from ..entropy.cavlc_jax import words_to_bytes
    total_bits = int(total_bits)
    if total_bits > cap_words * 32 - 32:
        raise RuntimeError("P payload overflow; raise CAP_BYTES_PER_MB")
    n_words = (total_bits + 31) // 32
    payload, nbits = words_to_bytes(np.asarray(words[:n_words]), total_bits)
    sh = enc._slice_header(ftype, qp)
    bw = slice_header_write(sh, nal_mod.NAL_PRIORITY_HIGH)
    append_bitstring(bw, payload, nbits)
    bw.rbsp_trailing()
    nals = [nal_mod.nal_encode(nal_mod.NAL_SLICE, nal_mod.NAL_PRIORITY_HIGH,
                               bw.getvalue())]
    enc.frame_num = (enc.frame_num + 1) % (1 << enc.sps.log2_max_frame_num)
    enc.poc += 2
    if enc.p.analyse.psnr or enc.p.analyse.ssim or enc.p.dump_yuv \
            or enc.p.full_recon:
        recon = [np.asarray(r) for r in recon]
    return nals, list(recon)
