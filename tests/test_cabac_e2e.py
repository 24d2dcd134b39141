"""CABAC end-to-end conformance (reference: common/cabac.c engine,
encoder/cabac.c MB writer; ours: native/cabac.cpp via
entropy/cabac_host.py).

The emitted main-profile CABAC stream is decoded with libavcodec
(tools/avdec) and must reproduce the encoder's reconstruction bit-exactly.
Also checks the CABAC stream is smaller than CAVLC at matched QP
(reference claims ~8-12%)."""

import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from x264_tpu import param_default_preset  # noqa: E402
from x264_tpu.encoder.encoder import Encoder, Picture  # noqa: E402

AVDEC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools", "avdec")

W, H = 96, 64


def _clip(n, structured=True):
    rng = np.random.default_rng(11)
    yy, xx = np.mgrid[0:H, 0:W]
    frames = []
    for i in range(n):
        if structured:
            y = np.clip(110 + 70 * np.sin(xx / 11 + i * .6) * np.cos(yy / 9)
                        + rng.integers(-10, 10, (H, W)), 0,
                        255).astype(np.uint8)
        else:
            y = rng.integers(0, 256, (H, W)).astype(np.uint8)
        u = rng.integers(0, 256, (H // 2, W // 2)).astype(np.uint8)
        v = rng.integers(0, 256, (H // 2, W // 2)).astype(np.uint8)
        frames.append([y, u, v])
    return frames


def _encode(frames, cabac, qp=26, aq=None, threads=1):
    p = param_default_preset("veryfast")
    p.width, p.height = W, H
    p.cabac = cabac
    p.threads = threads
    p.bframe = 0          # IPPP: recons compared positionally
    p.rc.rc_method = 0
    p.rc.qp_constant = qp
    if aq is not None:
        p.rc.aq_mode = aq
    enc = Encoder(p)
    nals_all, recons = [], []
    for i, f in enumerate(frames):
        nals, out = enc.encode(Picture(f, pts=i))
        if out is not None:
            nals_all += nals
            recons.append(out.recon)
    while enc.delayed_frames():
        nals, out = enc.encode(None)
        nals_all += nals
        recons.append(out.recon)
    data = b""
    for n in enc.headers() + nals_all:
        data += b"\x00\x00\x00\x01" + n.payload
    return data, recons


def _refdec_check(data, recons_coding_order):
    """Second oracle: in-repo spec CABAC decoder, coding order."""
    sys.path.insert(0, os.path.dirname(AVDEC))
    import refdec
    rframes = refdec.Decoder().decode(data)
    assert len(rframes) == len(recons_coding_order)
    for i, (rf, rec) in enumerate(zip(rframes, recons_coding_order)):
        for pi in range(3):
            assert np.array_equal(rf[pi], np.asarray(rec[pi])), \
                f"refdec frame {i} plane {pi}"


def _avdec(data, tmp_path):
    bs = tmp_path / "t.264"
    out = tmp_path / "t.yuv"
    bs.write_bytes(data)
    subprocess.run([AVDEC, str(bs), str(out)], check=True,
                   capture_output=True)
    raw = out.read_bytes()
    fsz = W * H * 3 // 2
    frames = []
    for i in range(len(raw) // fsz):
        b0 = raw[i * fsz:(i + 1) * fsz]
        y = np.frombuffer(b0[:W * H], np.uint8).reshape(H, W)
        u = np.frombuffer(b0[W * H:W * H + W * H // 4],
                          np.uint8).reshape(H // 2, W // 2)
        v = np.frombuffer(b0[W * H + W * H // 4:],
                          np.uint8).reshape(H // 2, W // 2)
        frames.append([y, u, v])
    return frames


@pytest.mark.parametrize("qp,aq", [(26, None), (32, 1)])
def test_cabac_ippp_conformant(tmp_path, qp, aq):
    frames = _clip(4)
    data, recons = _encode(frames, cabac=True, qp=qp, aq=aq)
    _refdec_check(data, recons)
    dec = _avdec(data, tmp_path)
    assert len(dec) == len(recons)
    for i, (df, rf) in enumerate(zip(dec, recons)):
        for pi in range(3):
            assert np.array_equal(np.asarray(df[pi]),
                                  np.asarray(rf[pi])), f"f{i} p{pi}"


def test_cabac_noise_conformant(tmp_path):
    frames = _clip(3, structured=False)
    data, recons = _encode(frames, cabac=True, qp=20)
    _refdec_check(data, recons)
    dec = _avdec(data, tmp_path)
    assert len(dec) == len(recons)
    for i, (df, rf) in enumerate(zip(dec, recons)):
        for pi in range(3):
            assert np.array_equal(np.asarray(df[pi]),
                                  np.asarray(rf[pi])), f"f{i} p{pi}"


def test_cabac_smaller_than_cavlc(tmp_path):
    frames = _clip(4)
    data_cabac, _ = _encode(frames, cabac=True)
    data_cavlc, _ = _encode(frames, cabac=False)
    # reference: CABAC typically saves ~8-12%; require any saving at all
    assert len(data_cabac) < len(data_cavlc), \
        (len(data_cabac), len(data_cavlc))


def test_cabac_pipelined_threads(tmp_path):
    frames = _clip(4)
    data, recons = _encode(frames, cabac=True, threads=0)
    _refdec_check(data, recons)
    dec = _avdec(data, tmp_path)
    assert len(dec) == len(recons)
    for i, (df, rf) in enumerate(zip(dec, recons)):
        for pi in range(3):
            assert np.array_equal(np.asarray(df[pi]),
                                  np.asarray(rf[pi])), f"f{i} p{pi}"


def test_cabac_bframes_conformant(tmp_path):
    """CABAC B slices (native/cabac.cpp B writer: mb_type tree 27+,
    per-list mvd, skip ctx 24+)."""
    frames = _clip(7)
    p = param_default_preset("veryfast")
    p.width, p.height = W, H
    p.cabac = True
    p.threads = 1
    p.bframe = 2
    p.scenecut_threshold = 0
    p.rc.rc_method = 0
    p.rc.qp_constant = 26
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
    from x264_tpu.encoder.encoder import TYPE_B
    assert TYPE_B in [o.i_type for o in outs]
    data = b""
    for n in enc.headers() + nals_all:
        data += b"\x00\x00\x00\x01" + n.payload
    _refdec_check(data, [o.recon for o in outs])
    dec = _avdec(data, tmp_path)
    assert len(dec) == len(outs)
    by_pts = {o.pts: o for o in outs}
    for disp, df in enumerate(dec):
        o = by_pts[disp]
        for pi in range(3):
            assert np.array_equal(np.asarray(df[pi]),
                                  np.asarray(o.recon[pi])), \
                f"display {disp} plane {pi}"
