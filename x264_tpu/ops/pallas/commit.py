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


# ======================================================== I_4x4 z-scan path
#
# The 16-step z-scan inner reconstruction (intra._i4_commit_mb) re-expressed
# for Mosaic: every 4x4 block lives as a FLAT [mbh, 16] lane vector, every
# neighbor read / write / transform is a constant-matrix product, so no
# sublane gathers, reshapes or dynamic slices appear in the kernel. The
# 17x21 per-MB extension buffer is a flat [mbh, 357] vector; 2D DCT/IDCT
# act on flat vectors through Kronecker-product matrices
# (vec(C X C^T) = (C (x) C) vec(X), row-major vec).

_EXT_H, _EXT_W = 17, 21
_NEXT = _EXT_H * _EXT_W                     # 357


def _eidx(r, c):
    return r * _EXT_W + c


def _kron(a, b):
    return np.kron(a, b).astype(np.int32)


_I4_KCF = _kron(_CF, _CF)                   # forward 4x4 DCT on flat blocks
_I4 = np.eye(4, dtype=np.int32)
_I4_KIA_L = _kron(_IA, _I4)
_I4_KIB_L = _kron(_IB, _I4)
_I4_KIA_R = _kron(_I4, _IA)
_I4_KIB_R = _kron(_I4, _IB)

# z-scan coding order of the 16 luma 4x4 blocks (spec figure 6-10)
_I4_ZX = (0, 1, 0, 1, 2, 3, 2, 3, 0, 1, 0, 1, 2, 3, 2, 3)
_I4_ZY = (0, 0, 1, 1, 0, 0, 1, 1, 2, 2, 3, 3, 2, 2, 3, 3)
# above-right availability kind (intra._i4_block_avail): 0 none (always
# substitute t[3]), 1 lane (depends on the MB's `at`), 2 real
_I4_TR_UNAVAIL = {(1, 1), (3, 1), (3, 2), (1, 3), (3, 3)}


def _i4_kind(bx, by):
    if by == 0:
        return 0 if bx == 3 else 1
    return 0 if (bx, by) in _I4_TR_UNAVAIL else 2


def _i4_mode_plan(m, x, y):
    """(source, index) of 4x4 mode m at position (y, x), mirroring
    ops/predict.predict_4x4_all. source in {'e','f','h',None};
    m == 8 positions zhu >= 5 return (None, special) handled by masks."""
    if m == 0:
        return "e", 5 + x
    if m == 1:
        return "e", 3 - y
    if m == 3:
        return "f", 6 + x + y
    if m == 4:
        return "f", 4 + x - y
    if m == 5:
        zvr = 2 * x - y
        idx = 4 + x - (y >> 1)
        if zvr == -3:
            return "f", 2
        if zvr >= 0 and zvr % 2 == 0:
            return "h", idx
        return "f", idx
    if m == 6:
        zhd = 2 * y - x
        if zhd < -1:
            return "f", 3 + x
        if zhd % 2 == 0:
            return "h", max(3 - (y - (x >> 1)), 0)
        return "f", max(4 - y + (x >> 1), 1)
    if m == 7:
        if y % 2 == 0:
            return "h", 5 + x + (y >> 1)
        return "f", 6 + x + (y >> 1)
    if m == 8:
        zhu = x + 2 * y
        if zhu > 5:
            return None, "l3"
        if zhu == 5:
            return None, "hu55"
        ilow = 2 - y - (x >> 1)
        if zhu % 2 == 0:
            return "h", max(ilow, 0)
        return "f", max(ilow, 1)
    raise AssertionError(m)


def _build_i4_consts():
    """All static matrices of the in-kernel I4 path (built once)."""
    # mode prediction: pred_all[mbh, 144] = e@ME^T + f3@MF^T + h2@MH^T
    # (mode 2 = DC and the HU specials stay zero; masks fill them in)
    ME = np.zeros((144, 14), np.int32)
    MF = np.zeros((144, 14), np.int32)
    MH = np.zeros((144, 14), np.int32)
    HU = np.zeros((2, 16), np.int32)        # row 0: zhu==5, row 1: zhu>5
    for m in range(9):
        if m == 2:
            continue
        for y in range(4):
            for x in range(4):
                row = m * 16 + 4 * y + x
                src, idx = _i4_mode_plan(m, x, y)
                if src == "e":
                    ME[row, idx] = 1
                elif src == "f":
                    MF[row, idx] = 1
                elif src == "h":
                    MH[row, idx] = 1
                elif idx == "hu55":
                    HU[0, 4 * y + x] = 1
                else:                        # l3
                    HU[1, 4 * y + x] = 1
    # edge placement: ext0[mbh,357] = cat(top16, left16, tl)[mbh,33] @ PL^T
    PL = np.zeros((_NEXT, 33), np.int32)
    for k in range(16):
        PL[_eidx(0, 1 + k), k] = 1           # top row
        PL[_eidx(1 + k, 0), 16 + k] = 1      # left col
    PL[_eidx(0, 0), 32] = 1                  # top-left corner
    # per-z: e-vector selection (real + 'none'-substituted variants),
    # source block selection, recon scatter back into ext
    SEL_E = np.zeros((16 * 14, _NEXT), np.int32)
    SEL_EN = np.zeros((16 * 14, _NEXT), np.int32)
    SEL_SRC = np.zeros((16 * 16, 256), np.int32)
    SCAT = np.zeros((16 * _NEXT, 16), np.int32)
    for z in range(16):
        bx, by = _I4_ZX[z], _I4_ZY[z]
        r4, c4 = 4 * by, 4 * bx
        base = z * 14
        # e = [l3,l2,l1,l0, Z, t0..t7, t7dup]
        for i in range(4):                   # lrev
            SEL_E[base + i, _eidx(r4 + 1 + (3 - i), c4)] = 1
        SEL_E[base + 4, _eidx(r4, c4)] = 1
        kind = _i4_kind(bx, by)
        for k in range(8):
            kk = k if (k < 4 or kind == 2) else (k if kind == 1 else 3)
            SEL_E[base + 5 + k, _eidx(r4, c4 + 1 + kk)] = 1
        SEL_E[base + 13, :] = SEL_E[base + 12, :]
        if kind == 1:                        # substituted alternative
            SEL_EN[base:base + 14] = SEL_E[base:base + 14]
            for k in range(4, 8):
                SEL_EN[base + 5 + k] = 0
                SEL_EN[base + 5 + k, _eidx(r4, c4 + 1 + 3)] = 1
            SEL_EN[base + 13, :] = SEL_EN[base + 12, :]
        for i in range(4):
            for j in range(4):
                SEL_SRC[z * 16 + 4 * i + j, (r4 + i) * 16 + (c4 + j)] = 1
                SCAT[z * _NEXT + _eidx(r4 + 1 + i, c4 + 1 + j),
                     4 * i + j] = 1
    EYE16 = np.eye(16, dtype=np.int32)
    return {"i4_me": ME, "i4_mf": MF, "i4_mh": MH, "i4_hu": HU,
            "i4_pl": PL, "i4_sel_e": SEL_E, "i4_sel_en": SEL_EN,
            "i4_sel_src": SEL_SRC, "i4_scat": SCAT, "i4_eye": EYE16,
            "i4_kcf": _I4_KCF, "i4_kia_l": _I4_KIA_L, "i4_kib_l": _I4_KIB_L,
            "i4_kia_r": _I4_KIA_R, "i4_kib_r": _I4_KIB_R}


_I4_CONST_NAMES = ("i4_me", "i4_mf", "i4_mh", "i4_hu", "i4_pl", "i4_sel_e",
                   "i4_sel_en", "i4_sel_src", "i4_scat", "i4_eye",
                   "i4_kcf", "i4_kia_l", "i4_kib_l", "i4_kia_r", "i4_kib_r")
_I4_CONSTS = _build_i4_consts()


def _i4_lanes(mbh, C4, srcf, m16, lqf, ldf, lsc_s, top, left, tl, al, at):
    """Z-scan I4 reconstruction of one wavefront strip, flat-lane form.

    srcf [mbh,256] flat luma tile; m16 [mbh,16] raster-block spec modes;
    lqf/ldf [mbh,16] flat quant/dequant matrices; lsc_s [mbh,8] scalar
    quant params (cols 0 qbits, 1 f_intra, 2 dshift); top/left [mbh,16],
    tl [mbh,1] true decoded MB edges; al/at [mbh,1] availability.
    Returns (ac_i4 [mbh,16,16] packed-tile levels, rec4 [mbh,16,16])."""
    qbits = lsc_s[:, 0][:, None]
    fq = lsc_s[:, 1][:, None]
    dsh = lsc_s[:, 2][:, None]
    edges = jnp.concatenate([top, left, tl], axis=-1)          # [mbh,33]
    ext = _mm(edges, C4["i4_pl"])                              # [mbh,357]
    ac_i4 = jnp.zeros((mbh, 16, 16), jnp.int32)
    rec4 = jnp.zeros((mbh, 16, 16), jnp.int32)
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (mbh, 4, 4), 1)
    ones_b = jnp.ones_like(al)

    def to4x4(flat):
        out = jnp.zeros((mbh, 4, 4), jnp.int32)
        for i in range(4):
            out = jnp.where(sub_iota == i, flat[:, 4 * i:4 * i + 4][:, None],
                            out)
        return out

    for z in range(16):
        bx, by = _I4_ZX[z], _I4_ZY[z]
        r = 4 * by + bx
        r4, c4 = 4 * by, 4 * bx
        e = _mm(ext, C4["i4_sel_e"][z * 14:(z + 1) * 14])      # [mbh,14]
        if _i4_kind(bx, by) == 1:
            en = _mm(ext, C4["i4_sel_en"][z * 14:(z + 1) * 14])
            e = jnp.where(at, e, en)
        zc = jnp.zeros((mbh, 1), jnp.int32)
        f3 = jnp.concatenate(
            [zc, (e[:, :-2] + 2 * e[:, 1:-1] + e[:, 2:] + 2) >> 2, zc],
            axis=-1)
        h2 = jnp.concatenate([(e[:, :-1] + e[:, 1:] + 1) >> 1, zc], axis=-1)
        pall = (_mm(e, C4["i4_me"]) + _mm(f3, C4["i4_mf"])
                + _mm(h2, C4["i4_mh"]))                        # [mbh,144]
        hu55 = (e[:, 1:2] + 3 * e[:, 0:1] + 2) >> 2
        hu = (pall[:, 128:144] + C4["i4_hu"][0][None] * hu55
              + C4["i4_hu"][1][None] * e[:, 0:1])
        al_b = al if bx == 0 else ones_b
        at_b = at if by == 0 else ones_b
        sum_t = jnp.sum(e[:, 5:9], axis=-1, keepdims=True)
        sum_l = jnp.sum(e[:, 0:4], axis=-1, keepdims=True)
        dcv = jnp.where(at_b & al_b, (sum_t + sum_l + 4) >> 3,
                        jnp.where(at_b, (sum_t + 2) >> 2,
                                  jnp.where(al_b, (sum_l + 2) >> 2, 128)))
        mode = m16[:, r:r + 1]                                 # [mbh,1]
        pred = jnp.broadcast_to(dcv, (mbh, 16))
        for m in (0, 1, 3, 4, 5, 6, 7):
            pred = jnp.where(mode == m, pall[:, m * 16:(m + 1) * 16], pred)
        pred = jnp.where(mode == 8, hu, pred)
        srcb = _mm(srcf, C4["i4_sel_src"][z * 16:(z + 1) * 16])
        res = srcb - pred
        w = _mm(res, C4["i4_kcf"])
        aw = jnp.abs(w)
        lv = jnp.sign(w) * ((aw * lqf + fq) >> qbits)
        l32 = lv * ldf
        pos = l32 << jnp.maximum(dsh, 0)
        rnd = jnp.where(dsh < 0, 1 << jnp.maximum(-dsh - 1, 0), 0)
        neg = (l32 + rnd) >> jnp.maximum(-dsh, 0)
        d = jnp.where(dsh >= 0, pos, neg)
        y1 = _mm(d, C4["i4_kia_l"]) + _mm(d >> 1, C4["i4_kib_l"])
        zz = _mm(y1, C4["i4_kia_r"]) + _mm(y1 >> 1, C4["i4_kib_r"])
        rb = jnp.clip(pred + ((zz + 32) >> 6), 0, 255)
        ext = ext + _mm(rb, C4["i4_scat"][z * _NEXT:(z + 1) * _NEXT])
        # place the block into the packed 16x16 tiles (matrix placement:
        # rows EYE[:, r4:r4+4], cols EYE[:, c4:c4+4])
        pr = C4["i4_eye"][:, r4:r4 + 4]
        pc = C4["i4_eye"][:, c4:c4 + 4]
        ac_i4 = ac_i4 + _mm(_lm(pr, to4x4(lv)), pc)
        rec4 = rec4 + _mm(_lm(pr, to4x4(rb)), pc)
    return ac_i4, rec4


def _make_kernel(mbw: int, mbh: int, mixed: bool, with_i4: bool = False):
    nC = len(_CONST_NAMES)
    nC4 = len(_I4_CONST_NAMES) if with_i4 else 0

    def kernel(*refs):
        # strip-major blocks: every per-strip ref has a leading singleton
        # strip axis so the last two block dims equal the array dims
        # (the Mosaic block-mapping requirement)
        C = {name: refs[i][:] for i, name in enumerate(_CONST_NAMES)}
        C4 = {name: refs[nC + i][:]
              for i, name in enumerate(_I4_CONST_NAMES)} if with_i4 else None
        (ysrc, usrc, vsrc, i16m, cmode, lqmf, ldmf, lsc,
         cqmf, cdmf, csc) = refs[nC + nC4:nC + nC4 + 11]
        rest = refs[nC + nC4 + 11:]
        if with_i4:
            i4lane_r, i4modes_r, ysrcf_r, lqmf16_r, ldmf16_r = rest[:5]
            rest = rest[5:]
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
        if with_i4:
            # I_4x4 lanes: exact z-scan reconstruction replaces the I16
            # result (intra._i4_commit_mb re-expressed; dc stays 0 and
            # the full 16-coeff blocks ride the ac slot)
            ac4, rec4 = _i4_lanes(mbh, C4, ysrcf_r[0], i4modes_r[0],
                                  lqmf16_r[0], ldmf16_r[0], lsc[0],
                                  top, left, tl, al, at)
            i4l3 = i4lane_r[0][..., None] > 0          # (mbh, 1, 1)
            recon = jnp.where(i4l3, rec4, recon)
            ac_lv = jnp.where(i4l3, ac4, ac_lv)
            dc_lv = jnp.where(i4l3, 0, dc_lv)
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
                      i4_mask=None, i4_modes=None, interpret=False):
    """Drop-in twin of intra._commit_scan built on the Pallas kernel.

    Returns (coeffs dict of raster [N,...] tensors, recon planes) with
    identical values/layouts to the XLA scan version. i4_mask/i4_modes
    enable the in-kernel I_4x4 z-scan path (same contract as the scan)."""
    H, W = y.shape
    Hc = H // 2
    D = skew.n_diags(mbw, mbh)
    P = P_STRIPS
    S = D + P
    mixed = is_intra is not None
    with_i4 = i4_mask is not None

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
    if with_i4:
        inputs += [np.asarray(_I4_CONSTS[nm], np.int32)
                   for nm in _I4_CONST_NAMES]
        in_specs += [pl.BlockSpec(_I4_CONSTS[nm].shape, lambda d: (0, 0))
                     for nm in _I4_CONST_NAMES]
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
    if with_i4:
        i4l = lanes(skew.skew_mb(jnp.asarray(i4_mask).astype(jnp.int32), P))
        i4m = skew.skew_mb(jnp.asarray(i4_modes, jnp.int32), P) \
            .transpose(1, 0, 2)                       # [S, mbh, 16]
        ysrcf = ys.astype(jnp.int32).reshape(S, mbh, 256)
        lqmf16 = lqmf.reshape(S, mbh, 16)
        ldmf16 = ldmf.reshape(S, mbh, 16)
        inputs += [i4l, i4m, ysrcf, lqmf16, ldmf16]
        in_specs += [
            pl.BlockSpec((1, mbh, 1), lambda d: (d + P_STRIPS, 0, 0)),
            pl.BlockSpec((1, mbh, 16), lambda d: (d + P_STRIPS, 0, 0)),
            pl.BlockSpec((1, mbh, 256), lambda d: (d + P_STRIPS, 0, 0)),
            pl.BlockSpec((1, mbh, 16), lambda d: (d + P_STRIPS, 0, 0)),
            pl.BlockSpec((1, mbh, 16), lambda d: (d + P_STRIPS, 0, 0)),
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
    kernel = _make_kernel(mbw, mbh, mixed, with_i4)
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
