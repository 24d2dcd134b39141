"""Pallas TPU kernel: the wavefront intra-commit scan in one fused
program (SURVEY §7.1; replaces the XLA lax.scan in intra._commit_scan).

Why a kernel: the commit scan is latency-bound — 187 diagonals at 1080p,
each a tiny [mbh]-lane step. As an XLA scan every step round-trips HBM
between fusions; here the rolling 3-strip reconstruction window lives in
VMEM scratch across sequential grid steps, the per-strip source/mode
blocks stream in via the grid pipeline, and per-strip coefficient blocks
stream out. One Mosaic program, zero per-step dispatch overhead.

Math mirrors ops/{predict,dct,quant}.py exactly (same reference:
predict.c 16x16/chroma modes, dct.c 4x4+hadamard, quant.c deadzone
quant / spec 8.5 dequant) — bit-exact vs intra._commit_scan, enforced by
tests/test_pallas_commit.py. The 2D 4x4-block transforms act on packed
16x16 tiles via block-diagonal matrices (MXU form); the >>1 terms of the
spec IDCT use a split A@X + B@(X>>1) decomposition since an integer
matrix cannot carry the floor shift.

Layout: everything skewed (ops/skew.py). Strips are [mbh, s, s] blocks
of the [mbh, s, S*s] skewed planes; quant parameters are precomputed
per-lane/strip tiles so no table gathers happen in-kernel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import skew
from ..tables import DEQUANT4_SCALE, DEQUANT4_MF, QUANT4_MF, QUANT4_SCALE

P_STRIPS = 2      # pad strips in the skewed layout (window covers d-2..d)

# ---- constant matrices (packed-tile block-diagonal forms) ----
_CF = np.array([[1, 1, 1, 1], [2, 1, -1, -2],
                [1, -1, -1, 1], [1, -2, 2, -1]], np.int32)
_H4 = np.array([[1, 1, 1, 1], [1, 1, -1, -1],
                [1, -1, -1, 1], [1, -1, 1, -1]], np.int32)
_H2 = np.array([[1, 1], [1, -1]], np.int32)
# spec 8.5.12.2 inverse core as A@X + B@(X>>1)
_IA = np.array([[1, 1, 1, 0], [1, 0, -1, -1],
                [1, 0, -1, 1], [1, -1, 1, 0]], np.int32)
_IB = np.array([[0, 0, 0, 1], [0, 1, 0, 0],
                [0, -1, 0, 0], [0, 0, 0, -1]], np.int32)


def _blockdiag(m, k):
    n = m.shape[0]
    out = np.zeros((n * k, n * k), np.int32)
    for i in range(k):
        out[i * n:(i + 1) * n, i * n:(i + 1) * n] = m
    return out


_CF16 = _blockdiag(_CF, 4)
_IA16 = _blockdiag(_IA, 4)
_IB16 = _blockdiag(_IB, 4)
_CF8 = _blockdiag(_CF, 2)
_IA8 = _blockdiag(_IA, 2)
_IB8 = _blockdiag(_IB, 2)
_S4 = np.zeros((4, 16), np.int32)     # DC-position selector (rows 0,4,..)
for _i in range(4):
    _S4[_i, 4 * _i] = 1
_S2 = np.zeros((2, 8), np.int32)
for _i in range(2):
    _S2[_i, 4 * _i] = 1
_DCMASK16 = (_S4.T @ np.ones((4, 4), np.int32) @ _S4)   # 1 at DC positions
_DCMASK8 = (_S2.T @ np.ones((2, 2), np.int32) @ _S2)


def _mm(a, m):
    """a @ m^T over the last axis (m constant). Mosaic has no int32
    matmul; f32 at HIGHEST precision is exact for |values| < 2^24 (the
    transform matrices are +-1/+-2 and every intermediate in the 4x4
    DCT/IDCT/hadamard chains is far below that bound)."""
    out = jax.lax.dot_general(
        a.astype(jnp.float32), m.T.astype(jnp.float32),
        (((a.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    return out.astype(jnp.int32)


def _lm(m, a):
    """m @ a over axis -2 (m constant): (m @ a) = (a^T @ m^T)^T."""
    at = a.swapaxes(-1, -2)
    return _mm(at, m).swapaxes(-1, -2)


def _tile2d(t, reps):
    """[mbh, n, n] -> [mbh, n*reps, n*reps] by tiling."""
    r = jnp.concatenate([t] * reps, axis=-1)
    return jnp.concatenate([r] * reps, axis=-2)


def _shift_lane_down(a):
    """[mbh, ...] -> previous lane's value (lane 0 gets zeros).
    Concatenate along sublanes is not Mosaic-lowerable; a rotate + mask
    is. Callers pass 2D (mbh, k) slices only."""
    r = pltpu.roll(a, 1, 0)
    lane0 = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0) == 0
    return jnp.where(lane0, 0, r)


def _fwd4x4_packed(res, cf):
    return _mm(_lm(cf, res), cf)


def _inv4x4_packed(d, ia, ib):
    y1 = _lm(ia, d) + _lm(ib, d >> 1)
    z = _mm(y1, ia) + _mm(y1 >> 1, ib)
    return (z + 32) >> 6


def _quant_packed(w, mf_tile, qbits, f):
    """Deadzone quant on a packed tile; qbits/f are [mbh,1,1]."""
    aw = jnp.abs(w)
    level = (aw * mf_tile + f) >> qbits
    return jnp.sign(w) * level


def _dequant_packed(lv, dmf_tile, shift):
    """Spec 8.5.12.1 on a packed tile; shift = qp//6-4 [mbh,1,1]."""
    l32 = lv * dmf_tile
    pos = l32 << jnp.maximum(shift, 0)
    rnd = jnp.where(shift < 0, 1 << jnp.maximum(-shift - 1, 0), 0)
    neg = (l32 + rnd) >> jnp.maximum(-shift, 0)
    return jnp.where(shift >= 0, pos, neg)


def _pred16_modes(left, top, tl, al, at):
    """V/H/DC/plane for [mbh] lanes; left/top [mbh,16] int32, tl [mbh,1].
    Mirrors ops/predict.py predict_16x16_all."""
    mbh = left.shape[0]
    v = jnp.broadcast_to(top[:, None, :], (mbh, 16, 16))
    h = jnp.broadcast_to(left[:, :, None], (mbh, 16, 16))
    sum_t = jnp.sum(top, axis=-1, keepdims=True)
    sum_l = jnp.sum(left, axis=-1, keepdims=True)
    dcv = jnp.where(at & al, (sum_t + sum_l + 16) >> 5,
                    jnp.where(at, (sum_t + 8) >> 4,
                              jnp.where(al, (sum_l + 8) >> 4, 128)))
    dc = jnp.broadcast_to(dcv[:, :, None], (mbh, 16, 16))
    tle = tl[:, 0]
    hg = jnp.zeros((mbh,), jnp.int32)
    vg = jnp.zeros((mbh,), jnp.int32)
    for x in range(1, 9):
        lo_t = top[:, 7 - x] if x < 8 else tle
        lo_l = left[:, 7 - x] if x < 8 else tle
        hg = hg + x * (top[:, 7 + x] - lo_t)
        vg = vg + x * (left[:, 7 + x] - lo_l)
    a = 16 * (left[:, 15] + top[:, 15])
    b = (5 * hg + 32) >> 6
    c = (5 * vg + 32) >> 6
    xx = jax.lax.broadcasted_iota(jnp.int32, (16, 16), 1) - 7
    yy = jax.lax.broadcasted_iota(jnp.int32, (16, 16), 0) - 7
    plane = (a[:, None, None] + b[:, None, None] * xx[None]
             + c[:, None, None] * yy[None] + 16) >> 5
    plane = jnp.clip(plane, 0, 255)
    return v, h, dc, plane


def _predc_modes(left, top, tl, al, at):
    """DC/H/V/plane chroma 8x8 (ops/predict.py predict_chroma_all)."""
    mbh = left.shape[0]
    h = jnp.broadcast_to(left[:, :, None], (mbh, 8, 8))
    v = jnp.broadcast_to(top[:, None, :], (mbh, 8, 8))
    st = [jnp.sum(top[:, :4], -1, keepdims=True),
          jnp.sum(top[:, 4:], -1, keepdims=True)]
    sl = [jnp.sum(left[:, :4], -1, keepdims=True),
          jnp.sum(left[:, 4:], -1, keepdims=True)]

    def dc_q(t, l_, prefer):
        both = (t + l_ + 4) >> 3
        t_only = (t + 2) >> 2
        l_only = (l_ + 2) >> 2
        if prefer == "both":
            return jnp.where(at & al, both,
                             jnp.where(at, t_only,
                                       jnp.where(al, l_only, 128)))
        if prefer == "top":
            return jnp.where(at, t_only, jnp.where(al, l_only, 128))
        return jnp.where(al, l_only, jnp.where(at, t_only, 128))

    q00 = dc_q(st[0], sl[0], "both")
    q01 = dc_q(st[1], sl[0], "top")
    q10 = dc_q(st[0], sl[1], "left")
    q11 = dc_q(st[1], sl[1], "both")
    row0 = jnp.concatenate(
        [jnp.broadcast_to(q00[:, :, None], (mbh, 1, 4)),
         jnp.broadcast_to(q01[:, :, None], (mbh, 1, 4))], axis=-1)
    row1 = jnp.concatenate(
        [jnp.broadcast_to(q10[:, :, None], (mbh, 1, 4)),
         jnp.broadcast_to(q11[:, :, None], (mbh, 1, 4))], axis=-1)
    dc = jnp.concatenate(
        [jnp.broadcast_to(row0, (mbh, 4, 8)),
         jnp.broadcast_to(row1, (mbh, 4, 8))], axis=-2)
    tle = tl[:, 0]
    hg = jnp.zeros((mbh,), jnp.int32)
    vg = jnp.zeros((mbh,), jnp.int32)
    for x in range(1, 5):
        lo_t = top[:, 3 - x] if x < 4 else tle
        lo_l = left[:, 3 - x] if x < 4 else tle
        hg = hg + x * (top[:, 3 + x] - lo_t)
        vg = vg + x * (left[:, 3 + x] - lo_l)
    a = 16 * (left[:, 7] + top[:, 7])
    b = (17 * hg + 16) >> 5
    c = (17 * vg + 16) >> 5
    xx = jax.lax.broadcasted_iota(jnp.int32, (8, 8), 1) - 3
    yy = jax.lax.broadcasted_iota(jnp.int32, (8, 8), 0) - 3
    plane = (a[:, None, None] + b[:, None, None] * xx[None]
             + c[:, None, None] * yy[None] + 16) >> 5
    plane = jnp.clip(plane, 0, 255)
    return dc, h, v, plane


def _onehot4(p0, p1, p2, p3, mode):
    m = mode[..., None]             # (mbh, 1) -> (mbh, 1, 1)
    return jnp.where(m == 0, p0,
                     jnp.where(m == 1, p1,
                               jnp.where(m == 2, p2, p3)))


def _luma_encode(src, pred, lqmf, ldmf, lsc, C):
    """Packed-tile I16 luma transform chain. lsc columns:
    0 qbits, 1 f, 2 dshift, 3 dc_mf00, 4 dc_qbits, 5 dc_f, 6 dc_dmf16,
    7 dc_per. Returns (dc_lv [mbh,4,4], ac_lv [mbh,16,16], recon)."""
    res = src - pred
    w = _fwd4x4_packed(res, C["cf16"])
    s4 = C["s4"]
    h4 = C["h4"]
    dcg = _mm(_lm(s4, w), s4)                      # [mbh,4,4] raster DCs
    dc_had = _mm(_lm(h4, dcg), h4) >> 1            # dct4x4dc
    mf00 = lsc[:, 3][:, None, None]
    dc_qb = lsc[:, 4][:, None, None]
    dc_f = lsc[:, 5][:, None, None]
    dc_lv = jnp.sign(dc_had) * ((jnp.abs(dc_had) * mf00 + dc_f) >> dc_qb)
    qbits = lsc[:, 0][:, None, None]
    fq = lsc[:, 1][:, None, None]
    mf_tile = _tile2d(lqmf, 4)
    ac_lv = _quant_packed(w, mf_tile, qbits, fq)
    dcmask = C["dcmask16"][None]
    ac_lv = ac_lv * (1 - dcmask)
    # reconstruction
    f4 = _mm(_lm(h4, dc_lv), h4)                   # inverse hadamard
    dmf16 = lsc[:, 6][:, None, None]
    per = lsc[:, 7][:, None, None]
    l32 = f4 * dmf16
    dc_vals = jnp.where(
        per >= 6, l32 << jnp.maximum(per - 6, 0),
        (l32 + (1 << jnp.maximum(5 - per, 0))) >> jnp.maximum(6 - per, 0))
    dmf_tile = _tile2d(ldmf, 4)
    d4 = _dequant_packed(ac_lv, dmf_tile, lsc[:, 2][:, None, None])
    d4 = d4 * (1 - dcmask) + _mm(_lm(s4.T, dc_vals), s4.T)
    r = _inv4x4_packed(d4, C["ia16"], C["ib16"])
    recon = jnp.clip(pred + r, 0, 255)
    return dc_lv, ac_lv, recon


def _chroma_encode(src, pred, cqmf, cdmf, csc, C):
    """Packed-tile chroma 8x8 chain. csc columns: 0 qbits, 1 f, 2 dshift,
    3 mf00, 4 dc_qbits, 5 dc_f, 6 dc_dmf16, 7 dc_per.
    Returns (dc_lv [mbh,2,2], ac_lv [mbh,8,8], recon)."""
    res = src - pred
    w = _fwd4x4_packed(res, C["cf8"])
    s2 = C["s2"]
    h2 = C["h2"]
    dcg = _mm(_lm(s2, w), s2)                      # [mbh,2,2]
    dc_had = _mm(_lm(h2, dcg), h2)                 # hadamard2x2
    mf00 = csc[:, 3][:, None, None]
    dc_qb = csc[:, 4][:, None, None]
    dc_f = csc[:, 5][:, None, None]
    dc_lv = jnp.sign(dc_had) * ((jnp.abs(dc_had) * mf00 + dc_f) >> dc_qb)
    qbits = csc[:, 0][:, None, None]
    fq = csc[:, 1][:, None, None]
    ac_lv = _quant_packed(w, _tile2d(cqmf, 2), qbits, fq)
    dcmask = C["dcmask8"][None]
    ac_lv = ac_lv * (1 - dcmask)
    f2 = _mm(_lm(h2, dc_lv), h2)
    dmf16 = csc[:, 6][:, None, None]
    per = csc[:, 7][:, None, None]
    dc_vals = ((f2 * dmf16) << per) >> 5           # spec 8.5.11
    d4 = _dequant_packed(ac_lv, _tile2d(cdmf, 2),
                         csc[:, 2][:, None, None])
    d4 = d4 * (1 - dcmask) + _mm(_lm(s2.T, dc_vals), s2.T)
    r = _inv4x4_packed(d4, C["ia8"], C["ib8"])
    recon = jnp.clip(pred + r, 0, 255)
    return dc_lv, ac_lv, recon


_CONST_NAMES = ("cf16", "ia16", "ib16", "s4", "h4", "dcmask16",
                "cf8", "ia8", "ib8", "s2", "h2", "dcmask8")
_CONSTS = {"cf16": _CF16, "ia16": _IA16, "ib16": _IB16, "s4": _S4,
           "h4": _H4, "dcmask16": _DCMASK16, "cf8": _CF8, "ia8": _IA8,
           "ib8": _IB8, "s2": _S2, "h2": _H2, "dcmask8": _DCMASK8}


def _make_kernel(mbw: int, mbh: int, mixed: bool):
    nC = len(_CONST_NAMES)

    def kernel(*refs):
        # strip-major blocks: every per-strip ref has a leading singleton
        # strip axis so the last two block dims equal the array dims
        # (the Mosaic block-mapping requirement)
        C = {name: refs[i][:] for i, name in enumerate(_CONST_NAMES)}
        (ysrc, usrc, vsrc, i16m, cmode, lqmf, ldmf, lsc,
         cqmf, cdmf, csc) = refs[nC:nC + 11]
        rest = refs[nC + 11:]
        if mixed:
            ilane_r, yint, uint_, vint = rest[:4]
            recy, recu, recv, dc_o, ac_o, udc_o, uac_o, vdc_o, vac_o = \
                rest[4:13]
            wy, wu, wv = rest[13:]
        else:
            recy, recu, recv, dc_o, ac_o, udc_o, uac_o, vdc_o, vac_o = \
                rest[:9]
            wy, wu, wv = rest[9:]
        d = pl.program_id(0)

        @pl.when(d == 0)
        def _():
            wy[:] = jnp.zeros_like(wy)
            wu[:] = jnp.zeros_like(wu)
            wv[:] = jnp.zeros_like(wv)

        lane = jax.lax.broadcasted_iota(jnp.int32, (mbh, 1), 0)
        x = d - lane
        valid = (x >= 0) & (x < mbw)
        al = valid & (x > 0)
        at = valid & (lane > 0)

        # ---- luma ----
        win = wy[:].astype(jnp.int32)
        mid = win[:, :, 16:32]
        top = _shift_lane_down(mid[:, 15, :])
        left = mid[:, :, 15]
        tl = _shift_lane_down(win[:, 15, 15:16])
        mode = i16m[0]          # (mbh, 1)
        pv, ph, pdc, ppl = _pred16_modes(left, top, tl, al, at)
        pred = _onehot4(pv, ph, pdc, ppl, mode)
        src = ysrc[0].astype(jnp.int32)
        dc_lv, ac_lv, recon = _luma_encode(src, pred, lqmf[0],
                                           ldmf[0], lsc[0], C)
        if mixed:
            il3 = ilane_r[0][..., None] > 0      # (mbh, 1, 1)
            recon = jnp.where(il3, recon, yint[0].astype(jnp.int32))
            dc_lv = jnp.where(il3, dc_lv, 0)
            ac_lv = jnp.where(il3, ac_lv, 0)
        dc_o[0] = dc_lv
        ac_o[0] = ac_lv
        recy[0] = recon.astype(jnp.int16)

        # ---- chroma (both components share neighbors geometry) ----
        def chroma(wref, csrc_ref, cint_ref, qmf, dmf, sc, dc_out, ac_out,
                   rec_out):
            cwin = wref[:].astype(jnp.int32)
            cmid = cwin[:, :, 8:16]
            ctop = _shift_lane_down(cmid[:, 7, :])
            cleft = cmid[:, :, 7]
            ctl = _shift_lane_down(cwin[:, 7, 7:8])
            cdcm, chm, cvm, cpl = _predc_modes(cleft, ctop, ctl, al, at)
            cpred = _onehot4(cdcm, chm, cvm, cpl, cmode[0])
            csrc = csrc_ref[0].astype(jnp.int32)
            cdc, cac, crec = _chroma_encode(csrc, cpred, qmf[0],
                                            dmf[0], sc[0], C)
            if mixed:
                crec = jnp.where(il3, crec, cint_ref[0].astype(jnp.int32))
                cdc = jnp.where(il3, cdc, 0)
                cac = jnp.where(il3, cac, 0)
            dc_out[0] = cdc
            ac_out[0] = cac
            rec_out[0] = crec.astype(jnp.int16)
            return crec

        urec = chroma(wu, usrc, uint_ if mixed else None, cqmf, cdmf, csc,
                      udc_o, uac_o, recu)
        vrec = chroma(wv, vsrc, vint if mixed else None, cqmf, cdmf, csc,
                      vdc_o, vac_o, recv)

        # ---- roll the windows: strips [d-1, d] become [d-2, d-1] ----
        wy[:] = jnp.concatenate([win[:, :, 16:32], recon],
                                axis=-1).astype(jnp.int16)
        wu[:] = jnp.concatenate([wu[:][:, :, 8:16].astype(jnp.int32),
                                 urec], axis=-1).astype(jnp.int16)
        wv[:] = jnp.concatenate([wv[:][:, :, 8:16].astype(jnp.int32),
                                 vrec], axis=-1).astype(jnp.int16)

    return kernel


def _quant_params(qp_sk):
    """Per-(lane,strip) quant parameter tensors from a skewed qp map
    [mbh, S] -> (qmf [mbh,S,4,4], dmf [mbh,S,4,4], sc [mbh,S,8]).
    Traceable (runs in XLA when the wrapper is jitted)."""
    q = jnp.asarray(qp_sk, jnp.int32)
    rem, per = q % 6, q // 6
    qmf = jnp.asarray(np.asarray(QUANT4_MF, np.int32))[rem]
    dmf = jnp.asarray(np.asarray(DEQUANT4_MF, np.int32))[rem] << 4
    qbits = 15 + per
    f = (21 << qbits) >> 6
    dshift = per - 4
    mf00 = jnp.asarray(np.asarray(QUANT4_SCALE, np.int32))[rem, 0]
    dc_qbits = 16 + per
    dc_f = (21 << dc_qbits) >> 6
    dc_dmf16 = jnp.asarray(np.asarray(DEQUANT4_SCALE, np.int32))[rem, 0] << 4
    sc = jnp.stack([qbits, f, dshift, mf00, dc_qbits, dc_f, dc_dmf16, per],
                   axis=-1)
    return qmf, dmf, sc


def commit_i16_pallas(y, u, v, i16_mode, chroma_mode, qp_mb, qpc_mb,
                      *, mbw, mbh, is_intra=None, inter_planes=None,
                      interpret=False):
    """Drop-in twin of intra._commit_scan built on the Pallas kernel.

    Returns (coeffs dict of raster [N,...] tensors, recon planes) with
    identical values/layouts to the XLA scan version."""
    H, W = y.shape
    Hc = H // 2
    D = skew.n_diags(mbw, mbh)
    P = P_STRIPS
    S = D + P
    mixed = is_intra is not None

    def strips(plane, s):
        """skewed plane [mbh*s, S*s] -> strip-major [S, mbh, s, s]."""
        return plane.reshape(mbh, s, S, s).transpose(2, 0, 1, 3)

    def lanes(mb_sk):
        """skewed per-MB scalars [mbh, S] -> [S, mbh, 1] (sublane-major
        so in-kernel broadcasts never relayout lanes to sublanes)."""
        return mb_sk.T.reshape(S, mbh, 1)

    ys = strips(skew.skew_plane(jnp.asarray(y).astype(jnp.int16), 16, P),
                16)
    us = strips(skew.skew_plane(jnp.asarray(u).astype(jnp.int16), 8, P), 8)
    vs = strips(skew.skew_plane(jnp.asarray(v).astype(jnp.int16), 8, P), 8)
    i16_sk = lanes(skew.skew_mb(jnp.asarray(i16_mode, jnp.int32), P))
    cm_sk = lanes(skew.skew_mb(jnp.asarray(chroma_mode, jnp.int32), P))
    qp_sk = skew.skew_mb(jnp.asarray(qp_mb, jnp.int32), P)
    qpc_sk = skew.skew_mb(jnp.asarray(qpc_mb, jnp.int32), P)
    lqmf, ldmf, lsc = _quant_params(qp_sk)
    cqmf, cdmf, csc = _quant_params(qpc_sk)
    lqmf, ldmf = [t.transpose(1, 0, 2, 3) for t in (lqmf, ldmf)]
    cqmf, cdmf = [t.transpose(1, 0, 2, 3) for t in (cqmf, cdmf)]
    lsc = lsc.transpose(1, 0, 2)
    csc = csc.transpose(1, 0, 2)

    inputs = [np.asarray(_CONSTS[nm], np.int32) for nm in _CONST_NAMES]
    in_specs = [pl.BlockSpec(_CONSTS[nm].shape, lambda d: (0, 0))
                for nm in _CONST_NAMES]
    inputs += [ys, us, vs, i16_sk, cm_sk, lqmf, ldmf, lsc, cqmf, cdmf, csc]
    in_specs += [
        pl.BlockSpec((1, mbh, 16, 16), lambda d: (d + P_STRIPS, 0, 0, 0)),
        pl.BlockSpec((1, mbh, 8, 8), lambda d: (d + P_STRIPS, 0, 0, 0)),
        pl.BlockSpec((1, mbh, 8, 8), lambda d: (d + P_STRIPS, 0, 0, 0)),
        pl.BlockSpec((1, mbh, 1), lambda d: (d + P_STRIPS, 0, 0)),
        pl.BlockSpec((1, mbh, 1), lambda d: (d + P_STRIPS, 0, 0)),
        pl.BlockSpec((1, mbh, 4, 4), lambda d: (d + P_STRIPS, 0, 0, 0)),
        pl.BlockSpec((1, mbh, 4, 4), lambda d: (d + P_STRIPS, 0, 0, 0)),
        pl.BlockSpec((1, mbh, 8), lambda d: (d + P_STRIPS, 0, 0)),
        pl.BlockSpec((1, mbh, 4, 4), lambda d: (d + P_STRIPS, 0, 0, 0)),
        pl.BlockSpec((1, mbh, 4, 4), lambda d: (d + P_STRIPS, 0, 0, 0)),
        pl.BlockSpec((1, mbh, 8), lambda d: (d + P_STRIPS, 0, 0)),
    ]
    if mixed:
        ia_sk = lanes(skew.skew_mb(jnp.asarray(is_intra).astype(jnp.int32),
                                   P))
        yi = strips(skew.skew_plane(
            jnp.asarray(inter_planes[0]).astype(jnp.int16), 16, P), 16)
        ui = strips(skew.skew_plane(
            jnp.asarray(inter_planes[1]).astype(jnp.int16), 8, P), 8)
        vi = strips(skew.skew_plane(
            jnp.asarray(inter_planes[2]).astype(jnp.int16), 8, P), 8)
        inputs += [ia_sk, yi, ui, vi]
        in_specs += [
            pl.BlockSpec((1, mbh, 1), lambda d: (d + P_STRIPS, 0, 0)),
            pl.BlockSpec((1, mbh, 16, 16),
                         lambda d: (d + P_STRIPS, 0, 0, 0)),
            pl.BlockSpec((1, mbh, 8, 8), lambda d: (d + P_STRIPS, 0, 0, 0)),
            pl.BlockSpec((1, mbh, 8, 8), lambda d: (d + P_STRIPS, 0, 0, 0)),
        ]

    out_shape = [
        jax.ShapeDtypeStruct((S, mbh, 16, 16), jnp.int16),    # recy
        jax.ShapeDtypeStruct((S, mbh, 8, 8), jnp.int16),
        jax.ShapeDtypeStruct((S, mbh, 8, 8), jnp.int16),
        jax.ShapeDtypeStruct((D, mbh, 4, 4), jnp.int32),      # dc
        jax.ShapeDtypeStruct((D, mbh, 16, 16), jnp.int32),    # ac packed
        jax.ShapeDtypeStruct((D, mbh, 2, 2), jnp.int32),      # udc
        jax.ShapeDtypeStruct((D, mbh, 8, 8), jnp.int32),      # uac packed
        jax.ShapeDtypeStruct((D, mbh, 2, 2), jnp.int32),
        jax.ShapeDtypeStruct((D, mbh, 8, 8), jnp.int32),
    ]
    out_specs = [
        pl.BlockSpec((1, mbh, 16, 16), lambda d: (d + P_STRIPS, 0, 0, 0)),
        pl.BlockSpec((1, mbh, 8, 8), lambda d: (d + P_STRIPS, 0, 0, 0)),
        pl.BlockSpec((1, mbh, 8, 8), lambda d: (d + P_STRIPS, 0, 0, 0)),
        pl.BlockSpec((1, mbh, 4, 4), lambda d: (d, 0, 0, 0)),
        pl.BlockSpec((1, mbh, 16, 16), lambda d: (d, 0, 0, 0)),
        pl.BlockSpec((1, mbh, 2, 2), lambda d: (d, 0, 0, 0)),
        pl.BlockSpec((1, mbh, 8, 8), lambda d: (d, 0, 0, 0)),
        pl.BlockSpec((1, mbh, 2, 2), lambda d: (d, 0, 0, 0)),
        pl.BlockSpec((1, mbh, 8, 8), lambda d: (d, 0, 0, 0)),
    ]
    scratch = [
        pltpu.VMEM((mbh, 16, 32), jnp.int16),   # luma strips d-2 | d-1
        pltpu.VMEM((mbh, 8, 16), jnp.int16),
        pltpu.VMEM((mbh, 8, 16), jnp.int16),
    ]
    kernel = _make_kernel(mbw, mbh, mixed)
    outs = pl.pallas_call(
        kernel,
        grid=(D,),
        in_specs=in_specs,
        out_shape=out_shape,
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=interpret,
        # the 16-wide strip blocks pad to 128 lanes, so the pipeline's
        # double buffers blow the 16M default scoped-vmem budget at
        # 1080p; v5e has 128M VMEM — give the kernel half of it
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(*inputs)
    recy, recu, recv, dc, ac, udc, uac, vdc, vac = outs

    def unstrips(t, s):
        return t.transpose(1, 2, 0, 3).reshape(mbh * s, S * s)

    recon = (
        skew.unskew_plane(unstrips(recy, 16), 16, mbw, P)
        .astype(jnp.uint8),
        skew.unskew_plane(unstrips(recu, 8), 8, mbw, P)
        .astype(jnp.uint8),
        skew.unskew_plane(unstrips(recv, 8), 8, mbw, P)
        .astype(jnp.uint8))

    def unsk(t):
        return skew.unskew_scan_outputs(t, mbw)

    n = mbw * mbh
    ac_blocks = unsk(ac).reshape(n, 4, 4, 4, 4).swapaxes(2, 3) \
        .reshape(n, 16, 4, 4)
    uac_b = unsk(uac).reshape(n, 2, 4, 2, 4).swapaxes(2, 3) \
        .reshape(n, 4, 4, 4)
    vac_b = unsk(vac).reshape(n, 2, 4, 2, 4).swapaxes(2, 3) \
        .reshape(n, 4, 4, 4)
    coeffs = {"dc": unsk(dc), "ac": ac_blocks,
              "udc": unsk(udc), "uac": uac_b,
              "vdc": unsk(vdc), "vac": vac_b}
    return coeffs, recon
