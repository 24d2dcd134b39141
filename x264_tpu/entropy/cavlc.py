"""Vectorized CAVLC entropy coding (spec 9.2; reference encoder/cavlc.c).

The reference writes CAVLC serially per-MB through a bit engine. Here the
whole frame's residual syntax is produced as parallel numpy arrays of
(code, bit-length) pairs — every block's coeff_token / signs / levels /
total_zeros / run_befores computed with vectorized table lookups — and then
concatenated by the shared bit packer (entropy/bits.pack_codes). The only
sequential state (level suffixLength, run zeros_left) iterates over the ≤16
coefficient slots, vectorized across all blocks of the frame.

Block coefficient inputs are in zig-zag scan order (forward). Levels beyond
the spec's 12-bit escape suffix are unrepresentable in CAVLC; callers must
clamp levels (the reference does the same via overflow re-encode,
encoder.c:2893).
"""

from __future__ import annotations

import numpy as np

from . import vlc_tables as V
from .bits import se_code, ue_code

# per-block element budget: token + 3 signs + 16 levels + total_zeros + 15
# runs
BLOCK_SLOTS = 36

# luma 4x4 block coding order (z-scan) -> raster position in the MB 4x4 grid
# raster index = LUMA4x4_RASTER[coding_idx]
LUMA4x4_RASTER = np.array(
    [0, 1, 4, 5, 2, 3, 6, 7, 8, 9, 12, 13, 10, 11, 14, 15])
# inverse: coding index of raster position
LUMA4x4_CODING = np.argsort(LUMA4x4_RASTER)


def nc_class(nc: np.ndarray) -> np.ndarray:
    """Map nC value to coeff_token table index (chromaDC handled separately:
    class 4 for 4:2:0, 5 for 4:2:2)."""
    return np.where(nc < 2, 0, np.where(nc < 4, 1, np.where(nc < 8, 2, 3)))


def reverse_nonzeros(coeffs: np.ndarray):
    """For [B, L] zig-zag coeffs, return (levels_rev, pos_rev, total):
    nonzero levels and their scan positions ordered highest-frequency first,
    zero-padded after `total` entries (positions padded with -1)."""
    B, L = coeffs.shape
    nz = coeffs != 0
    total = nz.sum(axis=1).astype(np.int32)
    pos = np.arange(L, dtype=np.int32)[None, :]
    key = np.where(nz, -pos, L + 1)
    order = np.argsort(key, axis=1, kind="stable")
    levels_rev = np.take_along_axis(coeffs, order, axis=1)
    pos_rev = np.take_along_axis(np.broadcast_to(pos, coeffs.shape), order,
                                 axis=1).astype(np.int32)
    k = np.arange(L)[None, :]
    valid = k < total[:, None]
    levels_rev = np.where(valid, levels_rev, 0)
    pos_rev = np.where(valid, pos_rev, -1)
    return levels_rev.astype(np.int64), pos_rev, total


def residual_block_batch(coeffs: np.ndarray, nc: np.ndarray,
                         chroma_dc: bool = False):
    """CAVLC-encode a batch of residual blocks.

    coeffs: [B, L] int (zig-zag order), L in {16, 15, 4, 8}.
    nc: [B] nC context values (ignored when chroma_dc).
    Returns (codes [B, BLOCK_SLOTS] uint64, lens [B, BLOCK_SLOTS] int32,
             total_coeff [B]).
    """
    coeffs = np.asarray(coeffs, dtype=np.int64)
    B, L = coeffs.shape
    codes = np.zeros((B, BLOCK_SLOTS), dtype=np.uint64)
    lens = np.zeros((B, BLOCK_SLOTS), dtype=np.int32)
    levels_rev, pos_rev, total = reverse_nonzeros(coeffs)

    # trailing ones (up to 3 leading |1|s in reverse order)
    is_one = np.abs(levels_rev[:, :3]) == 1
    lead = np.cumprod(is_one, axis=1)
    t1 = lead.sum(axis=1).astype(np.int32)
    t1 = np.minimum(t1, total)

    # ---- coeff_token ----
    if chroma_dc:
        cls = np.full(B, 4 if L == 4 else 5, dtype=np.int64)
    else:
        cls = nc_class(np.asarray(nc)).astype(np.int64)
    tok_code = np.where(
        total == 0,
        V.COEFF0_TOKEN_CODE[cls],
        V.COEFF_TOKEN_CODE[cls, np.maximum(total - 1, 0), t1])
    tok_len = np.where(
        total == 0,
        V.COEFF0_TOKEN_LEN[cls],
        V.COEFF_TOKEN_LEN[cls, np.maximum(total - 1, 0), t1])
    codes[:, 0] = tok_code
    lens[:, 0] = tok_len

    # ---- trailing one sign flags (1 = negative) ----
    for k in range(3):
        active = k < t1
        codes[:, 1 + k] = np.where(active, (levels_rev[:, k] < 0), 0)
        lens[:, 1 + k] = np.where(active, 1, 0)

    # ---- levels ----
    sl = np.where((total > 10) & (t1 < 3), 1, 0).astype(np.int64)
    maxk = min(L, 16)
    for k in range(maxk):
        lv = levels_rev[:, k]
        active = (k >= t1) & (k < total)
        lc = np.where(lv > 0, 2 * lv - 2, -2 * lv - 1)
        lc = np.where((k == t1) & (t1 < 3), lc - 2, lc)
        lc = np.maximum(lc, 0)  # inactive lanes
        # suffixLength == 0 branch
        c0 = np.where(lc < 14, np.uint64(1),
                      np.where(lc < 30,
                               (np.uint64(1) << np.uint64(4))
                               | (lc - 14).astype(np.uint64),
                               (np.uint64(1) << np.uint64(12))
                               | np.minimum(lc - 30, 4095).astype(np.uint64)))
        l0 = np.where(lc < 14, lc + 1, np.where(lc < 30, 19, 28))
        # suffixLength > 0 branch
        slp = np.maximum(sl, 1)
        prefix = lc >> slp
        mask = (np.int64(1) << slp) - 1
        cp = ((np.uint64(1) << slp.astype(np.uint64))
              | (lc & mask).astype(np.uint64))
        lp = prefix + 1 + slp
        esc = prefix >= 15
        cp = np.where(esc, (np.uint64(1) << np.uint64(12))
                      | np.minimum(np.maximum(lc - (15 << slp), 0), 4095)
                      .astype(np.uint64), cp)
        lp = np.where(esc, 28, lp)
        use0 = sl == 0
        codes[:, 4 + k] = np.where(active, np.where(use0, c0, cp), 0)
        lens[:, 4 + k] = np.where(active, np.where(use0, l0, lp), 0)
        # update suffixLength
        new_sl = np.maximum(sl, 1)
        new_sl = new_sl + ((np.abs(lv) > (3 << (new_sl - 1))) & (new_sl < 6))
        sl = np.where(active, new_sl, sl)

    # ---- total_zeros ----
    tz = np.where(total > 0, pos_rev[:, 0] + 1 - total, 0).astype(np.int64)
    write_tz = (total > 0) & (total < L)
    ti = np.maximum(total - 1, 0)
    if chroma_dc and L == 4:
        tzc = V.TOTAL_ZEROS_2x2_CODE[np.minimum(ti, 2), np.minimum(tz, 3)]
        tzl = V.TOTAL_ZEROS_2x2_LEN[np.minimum(ti, 2), np.minimum(tz, 3)]
    elif chroma_dc:
        tzc = V.TOTAL_ZEROS_2x4_CODE[np.minimum(ti, 6), np.minimum(tz, 7)]
        tzl = V.TOTAL_ZEROS_2x4_LEN[np.minimum(ti, 6), np.minimum(tz, 7)]
    else:
        tzc = V.TOTAL_ZEROS_CODE[np.minimum(ti, 14), np.minimum(tz, 15)]
        tzl = V.TOTAL_ZEROS_LEN[np.minimum(ti, 14), np.minimum(tz, 15)]
    codes[:, 20] = np.where(write_tz, tzc, 0)
    lens[:, 20] = np.where(write_tz, tzl, 0)

    # ---- run_before ----
    zleft = np.where(write_tz, tz, 0).astype(np.int64)
    for k in range(maxk - 1):
        run = pos_rev[:, k] - pos_rev[:, k + 1] - 1
        active = (k < total - 1) & (zleft > 0)
        run = np.where(active, run, 0)
        ridx = np.minimum(zleft - 1, 6)
        ridx = np.maximum(ridx, 0)
        codes[:, 21 + k] = np.where(
            active, V.RUN_BEFORE_CODE[ridx, np.minimum(run, 15)], 0)
        lens[:, 21 + k] = np.where(
            active, V.RUN_BEFORE_LEN[ridx, np.minimum(run, 15)], 0)
        zleft = np.where(active, zleft - run, zleft)

    return codes, lens, total


# --------------------------------------------------------------------------
# frame-level assembly
# --------------------------------------------------------------------------
def luma_nc(nnz_blocks: np.ndarray, mbw: int, mbh: int) -> np.ndarray:
    """nC context per luma 4x4 block from neighbor nnz.

    nnz_blocks: [N, 16] total_coeff per block in raster order within the MB.
    Returns nc [N, 16]. Single-slice picture-boundary availability.
    """
    n = mbw * mbh
    grid = np.zeros((mbh * 4, mbw * 4), dtype=np.int32)
    tiles = nnz_blocks.reshape(mbh, mbw, 4, 4)
    grid = tiles.transpose(0, 2, 1, 3).reshape(mbh * 4, mbw * 4)
    na = np.zeros_like(grid)
    nb = np.zeros_like(grid)
    na[:, 1:] = grid[:, :-1]
    nb[1:, :] = grid[:-1, :]
    has_a = np.zeros(grid.shape, bool)
    has_b = np.zeros(grid.shape, bool)
    has_a[:, 1:] = True
    has_b[1:, :] = True
    nc = np.where(has_a & has_b, (na + nb + 1) >> 1,
                  np.where(has_a, na, np.where(has_b, nb, 0)))
    return nc.reshape(mbh, 4, mbw, 4).transpose(0, 2, 1, 3).reshape(n, 16)


def chroma_nc(nnz_blocks: np.ndarray, mbw: int, mbh: int) -> np.ndarray:
    """nC per chroma 4x4 AC block; nnz_blocks [N, 4] raster within MB."""
    n = mbw * mbh
    tiles = nnz_blocks.reshape(mbh, mbw, 2, 2)
    grid = tiles.transpose(0, 2, 1, 3).reshape(mbh * 2, mbw * 2)
    na = np.zeros_like(grid)
    nb = np.zeros_like(grid)
    na[:, 1:] = grid[:, :-1]
    nb[1:, :] = grid[:-1, :]
    has_a = np.zeros(grid.shape, bool)
    has_b = np.zeros(grid.shape, bool)
    has_a[:, 1:] = True
    has_b[1:, :] = True
    nc = np.where(has_a & has_b, (na + nb + 1) >> 1,
                  np.where(has_a, na, np.where(has_b, nb, 0)))
    return nc.reshape(mbh, 2, mbw, 2).transpose(0, 2, 1, 3).reshape(n, 4)


def encode_i16x16_frame(bw, i16_mode, chroma_mode, qp, slice_qp,
                        dc_z, ac_z, cdc, cac_z, mbw, mbh):
    """Assemble + append the MB layer of an all-I16x16 CAVLC slice.

    dc_z [N,16] (zig-zag of the DC hadamard), ac_z [N,16,16] (raster block
    order, full zig-zag w/ position 0 zero), cdc [N,2,4], cac_z [N,2,4,16].
    Appends to the slice-header BitWriter `bw`.
    """
    n = mbw * mbh
    # --- residual blocks ---
    nnz_ac = (ac_z[:, :, 1:] != 0).sum(axis=2).astype(np.int32)   # [N,16]
    nc_l = luma_nc(nnz_ac, mbw, mbh)
    dc_codes, dc_lens, _ = residual_block_batch(dc_z, nc_l[:, 0])
    acf = ac_z[:, :, 1:].reshape(n * 16, 15)
    ac_codes, ac_lens, _ = residual_block_batch(acf, nc_l.reshape(-1))
    ac_codes = ac_codes.reshape(n, 16, BLOCK_SLOTS)
    ac_lens = ac_lens.reshape(n, 16, BLOCK_SLOTS)
    cdc_codes, cdc_lens, _ = residual_block_batch(
        cdc.reshape(n * 2, 4), np.zeros(n * 2), chroma_dc=True)
    cdc_codes = cdc_codes.reshape(n, 2, BLOCK_SLOTS)
    cdc_lens = cdc_lens.reshape(n, 2, BLOCK_SLOTS)
    nnz_cac = (cac_z[:, :, :, 1:] != 0).sum(axis=3).astype(np.int32)
    nc_u = chroma_nc(nnz_cac[:, 0], mbw, mbh)
    nc_v = chroma_nc(nnz_cac[:, 1], mbw, mbh)
    nc_c = np.stack([nc_u, nc_v], axis=1)                  # [N,2,4]
    cacf = cac_z[:, :, :, 1:].reshape(n * 8, 15)
    cac_codes, cac_lens, _ = residual_block_batch(cacf, nc_c.reshape(-1))
    cac_codes = cac_codes.reshape(n, 8, BLOCK_SLOTS)
    cac_lens = cac_lens.reshape(n, 8, BLOCK_SLOTS)

    # --- cbp / mb_type ---
    cbp_luma = (nnz_ac.sum(axis=1) > 0)
    any_cac = nnz_cac.reshape(n, 8).sum(axis=1) > 0
    any_cdc = (cdc != 0).reshape(n, 8).sum(axis=1) > 0
    cbp_chroma = np.where(any_cac, 2, np.where(any_cdc, 1, 0))
    mb_type = 1 + i16_mode + 4 * cbp_chroma + 12 * cbp_luma

    # --- header elements ---
    h_codes = np.zeros((n, 3), dtype=np.uint64)
    h_lens = np.zeros((n, 3), dtype=np.int32)
    h_codes[:, 0], h_lens[:, 0] = ue_code(mb_type)
    h_codes[:, 1], h_lens[:, 1] = ue_code(chroma_mode)
    prev_qp = np.concatenate([[slice_qp], qp[:-1]])
    h_codes[:, 2], h_lens[:, 2] = se_code(qp - prev_qp)

    # --- gate blocks by cbp ---
    ac_lens = np.where(cbp_luma[:, None, None], ac_lens, 0)
    cdc_lens = np.where((cbp_chroma > 0)[:, None, None], cdc_lens, 0)
    cac_lens = np.where((cbp_chroma == 2)[:, None, None], cac_lens, 0)

    # --- order luma AC blocks in coding (z-scan) order ---
    ac_codes = ac_codes[:, LUMA4x4_RASTER]
    ac_lens = ac_lens[:, LUMA4x4_RASTER]

    codes = np.concatenate([
        h_codes,
        dc_codes,
        ac_codes.reshape(n, -1),
        cdc_codes.reshape(n, -1),
        cac_codes.reshape(n, -1),
    ], axis=1)
    lens = np.concatenate([
        h_lens,
        dc_lens,
        ac_lens.reshape(n, -1),
        cdc_lens.reshape(n, -1),
        cac_lens.reshape(n, -1),
    ], axis=1)
    bw.append_packed(codes.ravel(), lens.ravel())


# --------------------------------------------------------------------------
# scalar reference encoder for one block (checkasm twin, direct from spec)
# --------------------------------------------------------------------------
def residual_block_scalar(coeffs, nc, chroma_dc=False):
    """Returns list of (code, length) for one block. Spec 9.2, written
    independently of the vectorized path for cross-validation."""
    coeffs = list(map(int, coeffs))
    L = len(coeffs)
    elems = []
    nzpos = [i for i, c in enumerate(coeffs) if c != 0]
    total = len(nzpos)
    if chroma_dc:
        cls = 4 if L == 4 else 5
    else:
        cls = 0 if nc < 2 else 1 if nc < 4 else 2 if nc < 8 else 3
    if total == 0:
        return [(int(V.COEFF0_TOKEN_CODE[cls]), int(V.COEFF0_TOKEN_LEN[cls]))]
    rev = nzpos[::-1]
    levels = [coeffs[i] for i in rev]
    t1 = 0
    while t1 < min(3, total) and abs(levels[t1]) == 1:
        t1 += 1
    elems.append((int(V.COEFF_TOKEN_CODE[cls, total - 1, t1]),
                  int(V.COEFF_TOKEN_LEN[cls, total - 1, t1])))
    for k in range(t1):
        elems.append((1 if levels[k] < 0 else 0, 1))
    sl = 1 if (total > 10 and t1 < 3) else 0
    for k in range(t1, total):
        lv = levels[k]
        lc = 2 * lv - 2 if lv > 0 else -2 * lv - 1
        if k == t1 and t1 < 3:
            lc -= 2
        if sl == 0:
            if lc < 14:
                elems.append((1, lc + 1))
            elif lc < 30:
                elems.append(((1 << 4) | (lc - 14), 19))
            else:
                assert lc - 30 < 4096, "CAVLC level overflow"
                elems.append(((1 << 12) | (lc - 30), 28))
        else:
            prefix = lc >> sl
            if prefix < 15:
                elems.append(((1 << sl) | (lc & ((1 << sl) - 1)),
                              prefix + 1 + sl))
            else:
                assert lc - (15 << sl) < 4096, "CAVLC level overflow"
                elems.append(((1 << 12) | (lc - (15 << sl)), 28))
        if sl == 0:
            sl = 1
        if abs(lv) > (3 << (sl - 1)) and sl < 6:
            sl += 1
    if total < L:
        tz = rev[0] + 1 - total
        if chroma_dc and L == 4:
            elems.append((int(V.TOTAL_ZEROS_2x2_CODE[total - 1, tz]),
                          int(V.TOTAL_ZEROS_2x2_LEN[total - 1, tz])))
        elif chroma_dc:
            elems.append((int(V.TOTAL_ZEROS_2x4_CODE[total - 1, tz]),
                          int(V.TOTAL_ZEROS_2x4_LEN[total - 1, tz])))
        else:
            elems.append((int(V.TOTAL_ZEROS_CODE[total - 1, tz]),
                          int(V.TOTAL_ZEROS_LEN[total - 1, tz])))
        zleft = tz
    else:
        zleft = 0
    for k in range(total - 1):
        if zleft <= 0:
            break
        run = rev[k] - rev[k + 1] - 1
        ridx = min(zleft - 1, 6)
        elems.append((int(V.RUN_BEFORE_CODE[ridx, run]),
                      int(V.RUN_BEFORE_LEN[ridx, run])))
        zleft -= run
    return elems
