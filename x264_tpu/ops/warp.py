"""Per-MB window extraction ("warp") via MXU one-hot matmuls.

The subpel refine and MC stages need, for every MB, a small pixel window of
the reference at that MB's own integer motion vector — a data-dependent
gather. TPU gathers cost ~10ns/element (30+ ms per 1080p frame), and
Mosaic/Pallas DMA slices require 8/128-aligned dynamic offsets, so neither
path works. Instead the gather is expressed as two batched matmuls with
one-hot selection matrices, which the MXU executes at full rate — the TPU
re-expression of the reference's mc.get_ref pointer math (common/mc.h:269).

Exactness: pixel values 0..255 are exact in bfloat16 and each output
element is the product of exactly one 1.0 with one pixel, accumulated in
float32 — the result is bit-exact.

Structure: windows are banded — MB (y, x) of block size `bs` reads rows
[y*bs + off_y + lo, ... + WIN) and cols [x*bs + off_x + lo, ... + WIN) with
off in a bounded range, so the column selection only touches a few adjacent
bs-wide blocks (handled with one shifted block view + small one-hot per
block shift delta) and the row selection stays within a band of
(off_max - off_min + WIN) rows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def mb_windows(planes, off, *, bs: int, lo: int, hi: int, win: int,
               pad: int):
    """Extract per-MB windows from padded planes.

    planes: [P, Hp, Wp] (uint8/int), padded by `pad` px on every side.
    off:    [mbh, mbw, 2] int32 — per-MB (x, y) offset of the window's
            top-left relative to the MB origin, each in [lo, hi].
    Window top-left = (y*bs + pad + off_y, x*bs + pad + off_x).
    Returns [mbh, mbw, P, win, win] int16.
    """
    P, Hp, Wp = planes.shape
    mbh = (Hp - 2 * pad) // bs
    mbw = (Wp - 2 * pad) // bs
    band = hi - lo + win
    rel_max = hi + win - 1
    dlo = lo // bs if lo >= 0 else -((-lo + bs - 1) // bs)
    dhi = rel_max // bs
    assert pad + dlo * bs >= 0, (pad, dlo, bs)
    assert pad + dhi * bs + mbw * bs <= Wp, (pad, dhi, mbw, bs, Wp)

    # --- row bands: [mbh, P, band, Wp] ---
    bands = jnp.stack([
        jax.lax.dynamic_slice(planes, (0, i * bs + pad + lo, 0),
                              (P, band, Wp)) for i in range(mbh)])
    bands = bands.astype(jnp.bfloat16)

    # --- column (lane) selection: per block-shift delta, a small one-hot
    # einsum against the delta-shifted block view of the band ---
    xs_k = jnp.arange(win, dtype=jnp.int32)
    rel_col = off[:, :, 0:1] + xs_k[None, None, :]        # [mbh, mbw, win]
    s_ar = jnp.arange(bs, dtype=jnp.int32)
    Q = None
    for d in range(dlo, dhi + 1):
        # block view: cols pad + d*bs + [0, mbw*bs) -> [mbh,P,band,mbw,bs]
        bv = bands[:, :, :, pad + d * bs: pad + d * bs + mbw * bs]
        bv = bv.reshape(mbh, P, band, mbw, bs)
        sel = (rel_col[:, :, None, :] == (d * bs + s_ar)[None, None, :,
                                                         None])
        Sd = sel.astype(jnp.bfloat16)                     # [mbh,mbw,bs,win]
        q = jnp.einsum("bphms,bmsk->bphmk", bv, Sd,
                       preferred_element_type=jnp.float32)
        Q = q if Q is None else Q + q
    Q = Q.astype(jnp.bfloat16)                            # [mbh,P,band,mbw,win]

    # --- row selection ---
    r_ar = jnp.arange(win, dtype=jnp.int32)
    rel_row = off[:, :, 1:2] - lo + r_ar[None, None, :]   # [mbh, mbw, win]
    b_ar = jnp.arange(band, dtype=jnp.int32)
    T = (rel_row[:, :, :, None] == b_ar[None, None, None, :]) \
        .astype(jnp.bfloat16)                             # [mbh,mbw,win,band]
    out = jnp.einsum("bmrh,bphmk->bmprk", T, Q,
                     preferred_element_type=jnp.float32)
    return out.astype(jnp.int16)                          # [mbh,mbw,P,win,win]


def mb_windows_packed(planes, off, *, bs: int, win: int, pad: int):
    """Window gather with int32 packing: TPU gather cost is per-ELEMENT
    (~1.6ns each), so gathering 4 bytes per element and realigning with
    vectorized shifts is ~4x cheaper than a byte-wise gather.

    Same contract as mb_windows_ref. win must satisfy the realignment
    width: gathers ceil(win/4)+1 int32 words per row."""
    P, Hp, Wp = planes.shape
    mbh = (Hp - 2 * pad) // bs
    mbw = (Wp - 2 * pad) // bs
    n = mbh * mbw
    wpw = Wp // 4
    nw = (win + 3) // 4 + 1                 # int32 words per window row
    planes32 = jax.lax.bitcast_convert_type(
        planes.reshape(P, Hp, wpw, 4), jnp.int32)         # [P, Hp, wpw]

    base_y = ((jnp.arange(mbh, dtype=jnp.int32) * bs)[:, None] + pad
              + off[:, :, 1]).reshape(n)
    base_x = ((jnp.arange(mbw, dtype=jnp.int32) * bs)[None, :] + pad
              + off[:, :, 0]).reshape(n)
    q0 = base_x >> 2
    rem = (base_x & 3)[:, None, None, None]               # [n,1,1,1]

    rows = base_y[:, None, None] + jnp.arange(win, dtype=jnp.int32)[None, :,
                                                                    None]
    cols = q0[:, None, None] + jnp.arange(nw, dtype=jnp.int32)[None, None, :]
    rows = jnp.clip(rows, 0, Hp - 1)
    cols = jnp.clip(cols, 0, wpw - 1)
    g = planes32[:, rows, cols]                           # [P, n, win, nw]
    g = g.transpose(1, 0, 2, 3)                           # [n, P, win, nw]
    # byte realignment (little-endian): out word k = bytes rc+4k..rc+4k+3
    sh = 8 * rem
    lo_part = jax.lax.shift_right_logical(
        g[..., :nw - 1], jnp.broadcast_to(sh, g[..., :nw - 1].shape))
    hi_part = jax.lax.shift_left(
        g[..., 1:], jnp.broadcast_to(32 - sh, g[..., 1:].shape))
    packed = jnp.where(rem == 0, g[..., :nw - 1], lo_part | hi_part)
    by = jax.lax.bitcast_convert_type(packed, jnp.uint8)  # [n,P,win,nw-1,4]
    out = by.reshape(n, P, win, (nw - 1) * 4)[:, :, :, :win]
    return out.reshape(mbh, mbw, P, win, win).astype(jnp.int16)


def mb_windows_auto(planes, off, *, bs: int, lo: int, hi: int, win: int,
                    pad: int):
    """Window warp dispatcher. Small windows use the one-hot banded
    matmul (`mb_windows`): on the axon TPU runtime, a scattered-index
    GATHER fused with consumers crashes the device worker whenever any
    other program executed earlier in the process (runtime bug,
    root-caused round 3 — see docs/ROADMAP.md). The MXU one-hot form is
    bit-exact and immune. Wide luma windows keep the plain byte gather,
    which has never triggered the fault.

    The choice is resolved at LOWERING time per target platform
    (jax.lax.platform_dependent): the CPU backend cannot execute bf16
    dots (DotThunk UNIMPLEMENTED) and gathers are fine there, so CPU
    lowerings — including the virtual-CPU-mesh dryrun under a TPU
    default backend — always take the gather form."""
    if win <= 12:
        return jax.lax.platform_dependent(
            cpu=lambda: mb_windows_ref(planes, off, bs=bs, win=win,
                                       pad=pad),
            default=lambda: mb_windows(planes, off, bs=bs, lo=lo, hi=hi,
                                       win=win, pad=pad))
    return mb_windows_ref(planes, off, bs=bs, win=win, pad=pad)


def mb_windows_ref(planes, off, *, bs: int, win: int, pad: int):
    """Gather-based reference twin (for tests)."""
    P, Hp, Wp = planes.shape
    mbh = (Hp - 2 * pad) // bs
    mbw = (Wp - 2 * pad) // bs
    base_y = (jnp.arange(mbh, dtype=jnp.int32) * bs)[:, None] + pad \
        + off[:, :, 1]
    base_x = (jnp.arange(mbw, dtype=jnp.int32) * bs)[None, :] + pad \
        + off[:, :, 0]
    ar = jnp.arange(win, dtype=jnp.int32)
    rows = base_y[:, :, None, None] + ar[None, None, :, None]
    cols = base_x[:, :, None, None] + ar[None, None, None, :]
    return planes[:, rows, cols].transpose(1, 2, 0, 3, 4).astype(jnp.int16)
