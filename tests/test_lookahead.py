"""Lookahead / scene-cut tests (reference slicetype.c:1384)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from x264_tpu import param_default_preset  # noqa: E402
from x264_tpu.encoder.encoder import Encoder, Picture  # noqa: E402

W, H = 96, 64


def _encode_types(frames, scenecut=40, keyint_min=1):
    p = param_default_preset("veryfast")
    p.width, p.height = W, H
    p.cabac = False
    p.bframe = 0     # IPPP: refdec has no B decode yet
    p.threads = 1
    p.rc.rc_method = 0
    p.rc.qp_constant = 26
    p.scenecut_threshold = scenecut
    p.keyint_min = keyint_min
    enc = Encoder(p)
    types = []
    for i, f in enumerate(frames):
        nals, out = enc.encode(Picture(f, pts=i))
        if out is not None:
            types.append(out.i_type)
    while enc.delayed_frames():
        nals, out = enc.encode(None)
        types.append(out.i_type)
    from x264_tpu.encoder.encoder import TYPE_IDR
    return ["I" if t == TYPE_IDR else "P" for t in types]


def _smooth_clip(n, phase=0.0):
    yy, xx = np.mgrid[0:H, 0:W]
    out = []
    for i in range(n):
        y = np.clip(120 + 80 * np.sin(xx / 13 + i * 0.2 + phase)
                    * np.cos(yy / 11), 0, 255).astype(np.uint8)
        u = np.full((H // 2, W // 2), 120, np.uint8)
        v = np.full((H // 2, W // 2), 136, np.uint8)
        out.append([y, u, v])
    return out


def test_scenecut_fires_on_hard_cut():
    # two very different scenes spliced at frame 3
    a = _smooth_clip(3)
    rng = np.random.default_rng(7)
    b = [[rng.integers(0, 256, (H, W)).astype(np.uint8),
          np.full((H // 2, W // 2), 60, np.uint8),
          np.full((H // 2, W // 2), 200, np.uint8)] for _ in range(3)]
    types = _encode_types(a + b)
    assert types[0] == "I"
    assert types[3] == "I", types          # the cut
    assert types[1] == types[2] == "P", types
    # inside the noise scene, consecutive noise frames are still cuts by
    # cost (inter never predicts noise) — that is the reference behavior
    # with keyint_min=1 as set here


def test_no_scenecut_on_smooth_motion():
    types = _encode_types(_smooth_clip(6))
    assert types == ["I"] + ["P"] * 5, types


def test_scenecut_disabled():
    a = _smooth_clip(2)
    rng = np.random.default_rng(7)
    b = [[rng.integers(0, 256, (H, W)).astype(np.uint8),
          np.full((H // 2, W // 2), 60, np.uint8),
          np.full((H // 2, W // 2), 200, np.uint8)]]
    types = _encode_types(a + b, scenecut=0)
    assert types == ["I", "P", "P"], types


def test_lowres_filter_matches_reference_core():
    """lowres_plane must be bit-exact to frame_init_lowres_core
    (reference mc.c:484 FILTER) on all four phase planes."""
    import numpy as np
    from x264_tpu.encoder.lookahead import lowres_plane
    rng = np.random.default_rng(5)
    y = rng.integers(0, 256, (32, 48)).astype(np.uint8)
    H, W = y.shape
    src = np.pad(y.astype(np.int64), ((0, 2), (0, 2)), mode="edge")

    def FILTER(a, b, c, d):
        return (((a + b + 1) >> 1) + ((c + d + 1) >> 1) + 1) >> 1

    d0 = np.zeros((H // 2, W // 2), np.int64)
    dh = np.zeros_like(d0)
    dv = np.zeros_like(d0)
    dc = np.zeros_like(d0)
    for yy in range(H // 2):
        r0, r1, r2 = src[2 * yy], src[2 * yy + 1], src[2 * yy + 2]
        for x in range(W // 2):
            d0[yy, x] = FILTER(r0[2*x], r1[2*x], r0[2*x+1], r1[2*x+1])
            dh[yy, x] = FILTER(r0[2*x+1], r1[2*x+1], r0[2*x+2], r1[2*x+2])
            dv[yy, x] = FILTER(r1[2*x], r2[2*x], r1[2*x+1], r2[2*x+1])
            dc[yy, x] = FILTER(r1[2*x+1], r2[2*x+1], r1[2*x+2], r2[2*x+2])
    got0, phases = lowres_plane(y)
    np.testing.assert_array_equal(np.asarray(got0), d0)
    for ref, k in ((dh, 0), (dv, 1), (dc, 2)):
        np.testing.assert_array_equal(np.asarray(phases[k]), ref)
