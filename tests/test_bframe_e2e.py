"""B-frame end-to-end conformance (reference analyse.c:1844 B modes,
mvpred.c per-list MVP, spec 8.4.2.3.2 implicit weighted bipred).

Two independent oracles (doc/regression_test.txt two-decoder method):
streams are decoded with libavcodec (tools/avdec, display order) AND the
in-repo spec decoder (tools/refdec.py, coding order), each compared
bit-exact against the encoder's reconstruction."""

import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from x264_tpu import param_default_preset  # noqa: E402
from x264_tpu.encoder.encoder import (TYPE_B, TYPE_IDR,  # noqa: E402
                                      TYPE_P, Encoder, Picture)

AVDEC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools", "avdec")
W, H = 96, 64


def _clip(n, noise=8):
    rng = np.random.default_rng(11)
    yy, xx = np.mgrid[0:H, 0:W]
    frames = []
    for i in range(n):
        y = np.clip(110 + 70 * np.sin(xx / 11 + i * .5) * np.cos(yy / 9)
                    + rng.integers(-noise, noise, (H, W)), 0,
                    255).astype(np.uint8)
        u = rng.integers(100, 156, (H // 2, W // 2)).astype(np.uint8)
        v = rng.integers(100, 156, (H // 2, W // 2)).astype(np.uint8)
        frames.append([y, u, v])
    return frames


def _encode(frames, bframes=2, qp=26, threads=1, deblock=True, aq=0,
            adaptive=0):
    p = param_default_preset("veryfast")
    p.width, p.height = W, H
    p.cabac = False
    p.threads = threads
    p.bframe = bframes
    p.bframe_adaptive = adaptive   # 0: fixed cadence (type asserts)
    p.scenecut_threshold = 0
    p.deblocking_filter = deblock
    p.rc.rc_method = 0
    p.rc.qp_constant = qp
    p.rc.aq_mode = aq
    enc = Encoder(p)
    nals_all, outs = [], []
    for i, f in enumerate(frames):
        nals, out = enc.encode(Picture(f, pts=i))
        if out is not None:
            nals_all += nals
            outs.append(out)
    while enc.delayed_frames():
        nals, out = enc.encode(None)
        nals_all += nals
        outs.append(out)
    data = b""
    for n in enc.headers() + nals_all:
        data += b"\x00\x00\x00\x01" + n.payload
    return data, outs


def _check_conformance(data, outs, tmp_path):
    bs = tmp_path / "b.264"
    out = tmp_path / "b.yuv"
    bs.write_bytes(data)
    subprocess.run([AVDEC, str(bs), str(out)], check=True,
                   capture_output=True)
    raw = out.read_bytes()
    fsz = W * H * 3 // 2
    assert len(raw) // fsz == len(outs)
    by_pts = {o.pts: o for o in outs}
    for disp in range(len(outs)):
        b0 = raw[disp * fsz:(disp + 1) * fsz]
        dec = [np.frombuffer(b0[:W * H], np.uint8).reshape(H, W),
               np.frombuffer(b0[W * H:W * H + W * H // 4],
                             np.uint8).reshape(H // 2, W // 2),
               np.frombuffer(b0[W * H + W * H // 4:],
                             np.uint8).reshape(H // 2, W // 2)]
        o = by_pts[disp]
        for pi in range(3):
            assert np.array_equal(dec[pi], np.asarray(o.recon[pi])), \
                f"display {disp} type {o.i_type} plane {pi}"
    # second oracle: in-repo spec decoder, coding order
    sys.path.insert(0, os.path.dirname(AVDEC))
    import refdec
    rframes = refdec.Decoder().decode(data)
    assert len(rframes) == len(outs)
    for i, (rf, o) in enumerate(zip(rframes, outs)):
        for pi in range(3):
            assert np.array_equal(rf[pi], np.asarray(o.recon[pi])), \
                f"refdec frame {i} type {o.i_type} plane {pi}"


def test_ibbp_conformant(tmp_path):
    data, outs = _encode(_clip(7), bframes=2)
    types = [o.i_type for o in outs]
    assert types == [TYPE_IDR, TYPE_P, TYPE_B, TYPE_B, TYPE_P, TYPE_B,
                     TYPE_B], types
    _check_conformance(data, outs, tmp_path)


def test_b1_noise_conformant(tmp_path):
    # bframes=1, noisier content, AQ on
    data, outs = _encode(_clip(5, noise=30), bframes=1, qp=30, aq=1)
    assert TYPE_B in [o.i_type for o in outs]
    _check_conformance(data, outs, tmp_path)


def test_b_pipelined_threads(tmp_path):
    data, outs = _encode(_clip(6), bframes=2, threads=0)
    _check_conformance(data, outs, tmp_path)


def test_b_flush_tail_becomes_p(tmp_path):
    # 6 frames with bframes=3: IDR P(b-run) then tail flushed as P
    data, outs = _encode(_clip(6), bframes=3)
    types = {o.pts: o.i_type for o in outs}
    assert types[0] == TYPE_IDR
    _check_conformance(data, outs, tmp_path)


def test_b_dts_monotonic(tmp_path):
    data, outs = _encode(_clip(7), bframes=2)
    dts = [o.dts for o in outs]
    assert dts == sorted(dts), dts
    assert all(o.dts <= o.pts for o in outs), [(o.pts, o.dts)
                                               for o in outs]


def test_b_adaptive_conformant(tmp_path):
    """Fast adaptive B placement (slicetype.c:1580): types follow content;
    whatever the greedy picks must stay conformant on both oracles."""
    data, outs = _encode(_clip(8), bframes=3, adaptive=1)
    _check_conformance(data, outs, tmp_path)
