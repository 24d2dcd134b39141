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
  * Motion search is fully exhaustive (the ESA/dense-correlation form,
    which the reference notes is the natural TPU formulation,
    SURVEY.md §7.3.6): every full-pel offset is one shifted-plane SAD map;
    subpel refinement evaluates a static 5x5 qpel grid over per-MB hpel
    windows.

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

def _mv_cost_bits(mvd):
    """Approximate rate of an MV component (se golomb length)."""
    v = jnp.abs(mvd)
    nbits = jnp.zeros_like(v)
    for k in range(1, 16):
        nbits = nbits + ((2 * v + 1) >= (1 << k))
    return 2 * nbits - 1


_DECIMATE_TAB = np.array([3, 2, 2, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
                         np.int32)


def _decimate_score(lv_z):
    """x264 decimate score per block (reference decimate_score16,
    quant.c): +tab[run] per |level|==1 coeff, 'huge' if any |level|>1."""
    n, blocks, L = lv_z.shape
    nz = lv_z != 0
    big = jnp.any(jnp.abs(lv_z) > 1, axis=2)
    pos = jnp.arange(L, dtype=jnp.int32)[None, None, :]
    # run before each nonzero = gap to previous nonzero (scan order)
    last_prev = jax.lax.cummax(jnp.where(nz, pos, -1), axis=2)
    prev = jnp.concatenate(
        [jnp.full((n, blocks, 1), -1, jnp.int32), last_prev[:, :, :-1]],
        axis=2)
    run = jnp.where(nz, pos - prev - 1, 0)
    tab = jnp.asarray(_DECIMATE_TAB)
    sc = jnp.sum(jnp.where(nz, tab[jnp.clip(run, 0, 15)], 0), axis=2)
    return jnp.where(big, 99, sc).astype(jnp.int32)


def _tile_sad_map(diff_abs, mbh, mbw):
    """[H,W] absolute差 -> per-MB SAD [mbh, mbw]."""
    return diff_abs.reshape(mbh, 16, mbw, 16).sum(axis=(1, 3))


def _satd16(pred, src):
    """SATD of [N,16,16] blocks."""
    d = pred - src.astype(jnp.int32)
    dd = d.reshape(-1, 4, 4, 4, 4).swapaxes(2, 3).reshape(-1, 16, 4, 4)
    h = jnp.asarray(np.array([[1, 1, 1, 1], [1, -1, 1, -1],
                              [1, 1, -1, -1], [1, -1, -1, 1]], np.int32))
    t = jnp.einsum("ij,...jk,lk->...il", h, dd, h,
                   preferred_element_type=jnp.int32)
    return jnp.sum(jnp.abs(t), axis=(1, 2, 3)) >> 1


def motion_search(padded_ref, hpel, y_src, lam, me_range: int):
    """TPU-native motion search: exhaustive full-pel via shifted planes
    (no gathers — the dense-correlation form of ESA, reference me.c:618)
    followed by a windowed 7x7-qpel refinement with static offsets.

    Returns mv [N, 2] in quarter-pel units."""
    H, W = y_src.shape
    mbh, mbw = H // 16, W // 16
    n = mbh * mbw
    src16 = y_src.astype(jnp.int16)
    tiles = _mb_tiles(y_src, 16).reshape(n, 16, 16)
    R = me_range

    # ---- stage 1: exhaustive full-pel search (ESA, reference me.c:618):
    # every offset in [-R, R]^2 evaluated as a shifted-plane SAD map in
    # int16 (absdiff <= 255, 16-col partial sums <= 4080 — both fit), so
    # the fused shift+absdiff+reduce stays at 2 bytes/px of HBM traffic;
    # offsets processed in groups of 8 per scan step to amortize overhead
    offs = [(dx, dy) for dy in range(-R, R + 1) for dx in range(-R, R + 1)]
    while len(offs) % 8:
        offs.append(offs[-1])
    offsets = np.array(offs, np.int32).reshape(-1, 8, 2)
    fine = np.array([(dx, dy) for dy in (-1, 0, 1) for dx in (-1, 0, 1)],
                    np.int32)

    def esa_scan(offsets):
        def step(carry, off8):
            best_cost, best_mv = carry
            for k in range(8):
                dx, dy = off8[k, 0], off8[k, 1]
                shifted = jax.lax.dynamic_slice(
                    padded_ref, (mc.PAD + dy, mc.PAD + dx), (H, W)) \
                    .astype(jnp.int16)
                ad = jnp.abs(shifted - src16).reshape(mbh, 16, mbw, 16)
                sad = ad.sum(axis=3, dtype=jnp.int16) \
                    .sum(axis=1, dtype=jnp.int32)
                cost = sad + lam * (_mv_cost_bits(dx * 4)
                                    + _mv_cost_bits(dy * 4))
                better = cost < best_cost
                best_cost = jnp.where(better, cost, best_cost)
                new_mv = jnp.stack([jnp.broadcast_to(dx, sad.shape),
                                    jnp.broadcast_to(dy, sad.shape)],
                                   axis=-1)
                best_mv = jnp.where(better[..., None], new_mv, best_mv)
            return (best_cost, best_mv), None

        init = (jnp.full((mbh, mbw), 1 << 30, jnp.int32),
                jnp.zeros((mbh, mbw, 2), jnp.int32))
        (cost, mv), _ = jax.lax.scan(step, init, jnp.asarray(offsets))
        return cost, mv

    _, mv_c = esa_scan(offsets)

    # ---- stage 2: +-1 full-pel refine around coarse best ----
    # per-MB base differs -> shifted planes no longer shared; use one
    # window gather [N, 4, WIN, WIN] and evaluate static in-window offsets
    WIN = 24         # 16 + 2(left/up margin) + 6(right/down: +-1 fp + qpel)
    MARG = 2
    mv_fp = mv_c.reshape(n, 2)
    x0 = (jnp.arange(n, dtype=jnp.int32) % mbw) * 16
    y0 = (jnp.arange(n, dtype=jnp.int32) // mbw) * 16
    bx = x0 + mv_fp[:, 0] + mc.PAD - MARG
    by = y0 + mv_fp[:, 1] + mc.PAD - MARG
    ar = jnp.arange(WIN, dtype=jnp.int32)
    Hp, Wp = hpel.shape[1], hpel.shape[2]
    rows = jnp.clip(by[:, None, None] + ar[None, :, None], 0, Hp - 1)
    cols = jnp.clip(bx[:, None, None] + ar[None, None, :], 0, Wp - 1)
    win = hpel[:, rows, cols].astype(jnp.int32)      # [4, N, WIN, WIN]

    def win_block(plane_idx, oy, ox):
        return win[plane_idx, :, MARG + oy:MARG + oy + 16,
                   MARG + ox:MARG + ox + 16]

    best_cost = jnp.full((n,), 1 << 30, jnp.int32)
    best_d = jnp.zeros((n, 2), jnp.int32)
    for dy, dx in fine:
        pred = win_block(0, dy, dx)
        mvx = (mv_fp[:, 0] + dx) * 4
        mvy = (mv_fp[:, 1] + dy) * 4
        cost = _satd16(pred, tiles) + lam * (_mv_cost_bits(mvx)
                                             + _mv_cost_bits(mvy))
        better = cost < best_cost
        best_cost = jnp.where(better, cost, best_cost)
        best_d = jnp.where(better[:, None],
                           jnp.stack([jnp.full((n,), dx, jnp.int32),
                                      jnp.full((n,), dy, jnp.int32)],
                                     axis=1), best_d)

    # ---- stage 3: qpel refinement with static offsets: re-window at the
    # full-pel winner so every 5x5-qpel candidate is a static slice+avg of
    # the window (one small gather, no per-candidate gathers) ----
    bq_cost = best_cost
    bx2 = bx + best_d[:, 0]
    by2 = by + best_d[:, 1]
    rows2 = jnp.clip(by2[:, None, None] + ar[None, :, None], 0, Hp - 1)
    cols2 = jnp.clip(bx2[:, None, None] + ar[None, None, :], 0, Wp - 1)
    win2 = hpel[:, rows2, cols2].astype(jnp.int32)
    mv_fp2 = mv_fp + best_d
    best_q = mv_fp2 * 4
    for qdy in (-2, -1, 0, 1, 2):
        for qdx in (-2, -1, 0, 1, 2):
            if qdx == 0 and qdy == 0:
                continue
            fx, fy = qdx & 3, qdy & 3
            ix, iy = qdx >> 2, qdy >> 2
            q = fy * 4 + fx
            p0 = int(mc.HPEL_REF0[q])
            p1 = int(mc.HPEL_REF1[q])
            oy0 = iy + (1 if fy == 3 else 0)
            s0 = win2[p0, :, MARG + oy0:MARG + oy0 + 16,
                      MARG + ix:MARG + ix + 16]
            if q & 5:
                ox1 = ix + (1 if fx == 3 else 0)
                s1 = win2[p1, :, MARG + iy:MARG + iy + 16,
                          MARG + ox1:MARG + ox1 + 16]
                predq = (s0 + s1 + 1) >> 1
            else:
                predq = s0
            mvq = mv_fp2 * 4 + jnp.asarray([qdx, qdy], jnp.int32)[None, :]
            cost = _satd16(predq, tiles) + lam * (
                _mv_cost_bits(mvq[:, 0]) + _mv_cost_bits(mvq[:, 1]))
            better = cost < bq_cost
            bq_cost = jnp.where(better, cost, bq_cost)
            best_q = jnp.where(better[:, None], mvq, best_q)
    return best_q, jnp.sum(bq_cost)


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


@partial(jax.jit, static_argnames=("mbw", "mbh", "cap_words", "me_range",
                                   "deblock", "a_off", "b_off", "cqpo",
                                   "decimate"))
def encode_pframe_device(y, u, v, ref_y_pad, ref_hpel, ref_u_pad, ref_v_pad,
                         qp_mb, qpc_mb, slice_qp, lam,
                         *, mbw, mbh, cap_words, me_range, deblock=False,
                         a_off=0, b_off=0, cqpo=0, decimate=True):
    """Fused P-frame device pass: ME -> MVP/skip -> MC -> transform ->
    entropy -> packed payload. Returns (words, total_bits, recon, stats)."""
    from ..entropy.cavlc_jax import encode_pframe_entropy_dev
    H, W = y.shape
    n = mbw * mbh
    mvq, satd_cost = motion_search(ref_y_pad, ref_hpel, y, lam, me_range)
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

    # --- dct decimation (reference b_dct_decimate, macroblock.c:654):
    # drop 8x8 groups whose decimate score < 4 and whole-MB luma < 6 ---
    lv_z = dct.zigzag4(lv.reshape(n, 16, 4, 4))          # [n,16,16]
    dec_score = _decimate_score(lv_z) if decimate else \
        jnp.full((n, 16), 99, jnp.int32)                 # [n,16]
    quad_of = jnp.asarray(
        np.array([(r // 2) * 2 + (c // 2) for r in range(4)
                  for c in range(4)], np.int32))
    qsum = jnp.zeros((n, 4), jnp.int32)
    for b in range(16):
        qsum = qsum.at[:, quad_of[b]].add(dec_score[:, b])
    mb_sum = jnp.sum(qsum, axis=1)
    keep_quad = (qsum >= 4) & (mb_sum >= 6)[:, None]     # [n,4]
    keep_blk = keep_quad[:, quad_of]                     # [n,16]
    lv = jnp.where(keep_blk[:, :, None, None], lv.reshape(n, 16, 4, 4), 0)
    # redo dequant/recon with decimated levels
    dq = quant.dequant4x4(lv, qp[:, None])
    recon_y_mb = jnp.clip(pred_y + _luma_merge(dct.idct4x4(dq)), 0, 255)

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

    words, total_bits, eff_qp = encode_pframe_entropy_dev(
        skip, mvd, cbp_luma, cbp_chroma, qp, slice_qp,
        lv.reshape(n, 16, 4, 4),
        jnp.stack([udc.reshape(n, 2, 2), vdc.reshape(n, 2, 2)], axis=1),
        jnp.stack([uac.reshape(n, 4, 4, 4), vac.reshape(n, 4, 4, 4)],
                  axis=1),
        mbw=mbw, mbh=mbh, cap_words=cap_words)
    if deblock:
        from ..ops.deblock import compute_strengths, deblock_frame
        nnz4 = nnz_l.reshape(mbh, mbw, 4, 4).transpose(0, 2, 1, 3) \
            .reshape(mbh * 4, mbw * 4).astype(jnp.int32)
        bs_v, bs_h = compute_strengths(
            jnp.zeros((mbh, mbw), bool), nnz4, mv_field,
            mbw=mbw, mbh=mbh)
        recon_y, recon_u, recon_v = deblock_frame(
            recon_y, recon_u, recon_v, bs_v, bs_h,
            eff_qp.reshape(mbh, mbw), mbw=mbw, mbh=mbh,
            a_off=a_off, b_off=b_off, chroma_qp_offset=cqpo)
    stats = {"skip": jnp.sum(skip), "satd": satd_cost}
    return words, total_bits, (recon_y, recon_u, recon_v), stats


def dispatch_pframe(enc, planes, ftype, qp):
    """Device dispatch of one P frame. Returns (finalize_fn, recon_dev)."""
    from .intra import finalize_slice
    if enc.p.cabac:
        raise NotImplementedError("CABAC lands later; use --no-cabac")
    if not enc._dpb:
        raise RuntimeError("P frame without reference")
    mbw, mbh = enc.mb_w, enc.mb_h
    ref = enc._dpb[-1]
    y, u, v = [jnp.asarray(p) for p in planes]
    if enc.p.rc.aq_mode:
        from ..ops.aq import qp_maps
        qp_mb, qpc_mb = qp_maps(y, u, v, qp, enc.p.rc.aq_strength,
                                enc.p.rc.qp_min, enc.p.rc.qp_max,
                                enc.p.analyse.chroma_qp_offset)
    else:
        qp_mb = jnp.full((mbh, mbw), qp, jnp.int32)
        qpc_mb = jnp.asarray(
            chroma_qp(np.full((mbh, mbw), qp),
                      enc.p.analyse.chroma_qp_offset), jnp.int32)
    # SAD/SATD-domain lambda (reference x264_lambda_tab scale)
    lam = max(1, int(round(2.0 ** ((qp - 12) / 6.0))))

    cap_bpm = CAP_BYTES_PER_MB if qp >= 8 else 3 * CAP_BYTES_PER_MB
    cap_words = (mbw * mbh * cap_bpm) // 4
    me_range = min(enc.p.analyse.me_range, mc.PAD - 20)
    words, total_bits, recon, stats = encode_pframe_device(
        y, u, v, ref["y_pad"], ref["hpel"], ref["u_pad"], ref["v_pad"],
        qp_mb, qpc_mb, qp, lam,
        mbw=mbw, mbh=mbh, cap_words=cap_words, me_range=me_range,
        decimate=enc.p.analyse.dct_decimate,
        deblock=enc.p.deblocking_filter,
        a_off=enc.p.deblocking_filter_alphac0 * 2,
        b_off=enc.p.deblocking_filter_beta * 2,
        cqpo=enc.p.analyse.chroma_qp_offset)
    sh = enc._slice_header(ftype, qp)
    enc.frame_num = (enc.frame_num + 1) % (1 << enc.sps.log2_max_frame_num)
    enc.poc += 2
    materialize = (enc.p.analyse.psnr or enc.p.analyse.ssim
                   or enc.p.dump_yuv or enc.p.full_recon)

    def finalize():
        nals = finalize_slice(enc, words, total_bits, cap_words, sh,
                              nal_mod.NAL_SLICE, nal_mod.NAL_PRIORITY_HIGH)
        rec = [np.asarray(r) for r in recon] if materialize else list(recon)
        enc.rc.end(ftype, sum(len(n.payload) * 8 for n in nals),
                   float(stats["satd"]), qp)
        return nals, rec

    return finalize, list(recon)


def encode_pframe(enc, planes, ftype, qp):
    """Synchronous P-frame encode."""
    finalize, _ = dispatch_pframe(enc, planes, ftype, qp)
    return finalize()
