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
