"""Lookahead: lowres pyramid + slicetype costs + scene-cut detection.

Reference analogues: encoder/lookahead.c (frame FIFOs),
encoder/slicetype.c:514 (lowres MB costs), slicetype.c:1384 (scenecut with
flash awareness), common/mc.h:326 (frame_init_lowres). TPU re-expression:
the lowres pyramid is one fused downsample, and the per-8x8-block
inter/intra cost field for a whole frame is a single batched device pass
(no per-MB loop, no HEX iteration — a dense +-R full-pel search like the
main ME's ESA stage).

Current scope: P/IDR decision with scene-cut (B-adapt/MB-tree land with
B-frames). The decision runs one frame ahead of dispatch — the analogue
of the reference's dedicated lookahead thread consuming the ifbuf queue.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def lowres_plane(y):
    """Half-res filtered decimation (reference frame_init_lowres_core,
    mc.c: the 'f' phase — avg of the 2x2 with the +1 diagonal), here the
    simple 2x2 mean which serves the cost model."""
    H, W = y.shape
    t = y.astype(jnp.int32).reshape(H // 2, 2, W // 2, 2)
    return ((t.sum(axis=(1, 3)) + 2) >> 2).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("srange",))
def slicetype_costs(low_cur, low_ref, *, srange: int = 8):
    """Per-8x8-block inter and intra costs on lowres planes (reference
    slicetype_mb_cost, slicetype.c:514).

    inter: best SAD over integer offsets in [-srange, srange]^2 (dense
    shifted-plane search, the ESA form). intra: SAD against the DC
    prediction of the block (the cheap stand-in for the reference's
    intra 8x8c battery). Returns (icost_sum, pcost_sum) scalars."""
    H, W = low_cur.shape
    bh, bw = H // 8, W // 8
    cur = low_cur.astype(jnp.int16)
    tiles = cur.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)

    # intra: DC-pred SAD per block
    dc = ((tiles.astype(jnp.int32).sum(axis=(2, 3)) + 32) >> 6)
    icost_blk = jnp.abs(tiles.astype(jnp.int32)
                        - dc[:, :, None, None]).sum(axis=(2, 3))
    # lowres intra bias (reference adds a small constant per block)
    icost = jnp.sum(icost_blk)

    ref_pad = jnp.pad(low_ref, srange, mode="edge").astype(jnp.int16)
    offs = np.array([(dx, dy) for dy in range(-srange, srange + 1)
                     for dx in range(-srange, srange + 1)], np.int32)

    def step(best, off):
        dx, dy = off[0], off[1]
        shifted = jax.lax.dynamic_slice(ref_pad,
                                        (srange + dy, srange + dx), (H, W))
        ad = jnp.abs(shifted - cur).reshape(bh, 8, bw, 8)
        sad = ad.sum(axis=(1, 3), dtype=jnp.int32)
        return jnp.minimum(best, sad), None

    init = jnp.full((bh, bw), 1 << 30, jnp.int32)
    pcost_blk, _ = jax.lax.scan(step, init, jnp.asarray(offs))
    pcost = jnp.sum(jnp.minimum(pcost_blk, icost_blk))
    return icost, pcost


class Lookahead:
    """Slicetype decision state (reference x264_slicetype_decide).

    With B-frames off the decision is P vs IDR: scene-cut when the inter
    cost approaches the intra cost (slicetype.c:1384 rule
    pcost >= (1 - bias) * icost), with the keyint/min-keyint fences the
    orchestrator already applies."""

    def __init__(self, p) -> None:
        self.p = p
        self.prev_lowres = None
        self.threshold = p.scenecut_threshold / 100.0

    def reset(self) -> None:
        self.prev_lowres = None

    def scene_cut(self, y_plane) -> bool:
        """Feed the next source luma; True if a scene cut is detected
        against the previous source frame."""
        low = lowres_plane(jnp.asarray(y_plane))
        prev = self.prev_lowres
        self.prev_lowres = low
        if prev is None or self.threshold <= 0:
            return False
        icost, pcost = slicetype_costs(low, prev)
        icost = max(float(icost), 1.0)
        pcost = float(pcost)
        # reference: scene cut when inter gains too little over intra
        return pcost >= (1.0 - self.threshold) * icost
