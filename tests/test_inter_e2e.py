"""End-to-end IPPP conformance: encoder recon must equal both independent
decoders (tools/refdec.py and libavcodec via tools/avdec) bit-exactly."""

import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import refdec  # noqa: E402

from x264_tpu import param_default_preset  # noqa: E402
from x264_tpu.encoder.encoder import Encoder, Picture  # noqa: E402
from x264_tpu.entropy.nal import annexb_bytes  # noqa: E402

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")
AVDEC = os.path.join(TOOLS, "avdec")


def _ensure_avdec():
    if os.path.exists(AVDEC):
        return True
    r = subprocess.run(
        ["gcc", "-O2", os.path.join(TOOLS, "avdec.c"), "-o", AVDEC,
         "-lavcodec", "-lavutil"], capture_output=True)
    return r.returncode == 0


def moving_frames(n, w, h, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    out = []
    for i in range(n):
        y = np.clip(128 + 60 * np.sin((xx + 3 * i) / 17)
                    * np.cos((yy + 2 * i) / 13)
                    + rng.integers(-4, 4, (h, w)), 0, 255).astype(np.uint8)
        u = np.clip(128 + 40 * np.sin((xx[::2, ::2] + 3 * i) / 19), 0,
                    255).astype(np.uint8)
        v = np.clip(128 + 40 * np.cos((yy[::2, ::2] - 2 * i) / 23), 0,
                    255).astype(np.uint8)
        out.append([y, u, v])
    return out


def encode_ippp(frames, w, h, qp=26, keyint=250):
    p = param_default_preset("medium")
    p.width, p.height = w, h
    p.cabac = False
    p.bframe = 0     # IPPP: refdec has no B decode yet
    p.deblocking_filter = False
    p.keyint_max = keyint
    p.rc.rc_method = 0
    p.rc.qp_constant = qp
    p.full_recon = True
    p.threads = 1
    enc = Encoder(p)
    stream = annexb_bytes(enc.headers())
    recons = []
    types = []

    def take(nals, out):
        nonlocal stream
        stream += annexb_bytes(nals)
        if out is not None:
            recons.append(out.recon)
            types.append(out.i_type)
    for i, f in enumerate(frames):
        take(*enc.encode(Picture(f, pts=i)))
    while enc.delayed_frames():
        take(*enc.encode(None))
    return stream, recons, types


@pytest.mark.slow
def test_ippp_refdec_conformance():
    w, h = 64, 48
    frames = moving_frames(4, w, h)
    stream, recons, types = encode_ippp(frames, w, h)
    assert types[0] == 1 and all(t == 3 for t in types[1:])
    decoded = refdec.Decoder().decode(stream)
    assert len(decoded) == 4
    for i in range(4):
        for c in range(3):
            np.testing.assert_array_equal(decoded[i][c], recons[i][c],
                                          err_msg=f"frame {i} plane {c}")


def test_ippp_ffmpeg_conformance(tmp_path):
    if not _ensure_avdec():
        pytest.skip("libavcodec not available")
    w, h = 64, 48
    frames = moving_frames(5, w, h, seed=3)
    stream, recons, _ = encode_ippp(frames, w, h, qp=30)
    f264 = tmp_path / "s.264"
    f264.write_bytes(stream)
    out = tmp_path / "o.yuv"
    r = subprocess.run([AVDEC, str(f264), str(out), "16"],
                       capture_output=True, text=True)
    assert "error" not in r.stderr and "invalid" not in r.stderr, r.stderr
    raw = out.read_bytes()
    fsz = w * h * 3 // 2
    assert len(raw) == 5 * fsz
    for i in range(5):
        fr = raw[i * fsz:(i + 1) * fsz]
        fy = np.frombuffer(fr[:w * h], np.uint8).reshape(h, w)
        fu = np.frombuffer(fr[w * h:w * h * 5 // 4],
                           np.uint8).reshape(h // 2, w // 2)
        fv = np.frombuffer(fr[w * h * 5 // 4:], np.uint8).reshape(h // 2,
                                                                  w // 2)
        np.testing.assert_array_equal(fy, recons[i][0], err_msg=f"Y {i}")
        np.testing.assert_array_equal(fu, recons[i][1], err_msg=f"U {i}")
        np.testing.assert_array_equal(fv, recons[i][2], err_msg=f"V {i}")


def test_ippp_keyint_gop():
    """keyint forces periodic IDR; P quality reasonable."""
    w, h = 64, 48
    frames = moving_frames(5, w, h, seed=7)
    stream, recons, types = encode_ippp(frames, w, h, keyint=2)
    assert types == [1, 3, 1, 3, 1]
    decoded = refdec.Decoder().decode(stream)
    for i in range(5):
        for c in range(3):
            np.testing.assert_array_equal(decoded[i][c], recons[i][c])
    psnr = 10 * np.log10(255 ** 2 / np.mean(
        (recons[1][0].astype(float) - frames[1][0].astype(float)) ** 2))
    assert psnr > 30, psnr


def test_static_content_skips():
    """Static content should produce mostly-skip tiny P frames."""
    w, h = 64, 48
    f = moving_frames(1, w, h, seed=1)[0]
    stream, recons, types = encode_ippp([f, f, f], w, h)
    decoded = refdec.Decoder().decode(stream)
    for i in range(3):
        for c in range(3):
            np.testing.assert_array_equal(decoded[i][c], recons[i][c])


@pytest.mark.slow
def test_ippp_deblock_conformance(tmp_path):
    """In-loop deblocking on: conformance vs refdec and libavcodec."""
    w, h = 64, 48
    frames = moving_frames(3, w, h, seed=11)
    p = param_default_preset("medium")
    p.width, p.height = w, h
    p.cabac = False
    p.bframe = 0     # IPPP: refdec has no B decode yet
    p.deblocking_filter = True
    p.rc.rc_method = 0
    p.rc.qp_constant = 30
    p.full_recon = True
    p.threads = 1
    enc = Encoder(p)
    stream = annexb_bytes(enc.headers())
    recons = []
    for i, f in enumerate(frames):
        nals, out = enc.encode(Picture(f, pts=i))
        stream += annexb_bytes(nals)
        if out is not None:
            recons.append(out.recon)
    while enc.delayed_frames():
        nals, out = enc.encode(None)
        stream += annexb_bytes(nals)
        recons.append(out.recon)
    decoded = refdec.Decoder().decode(stream)
    for i in range(3):
        for c in range(3):
            np.testing.assert_array_equal(decoded[i][c], recons[i][c],
                                          err_msg=f"frame {i} plane {c}")
    if _ensure_avdec():
        f264 = tmp_path / "db.264"
        f264.write_bytes(stream)
        out_yuv = tmp_path / "db.yuv"
        r = subprocess.run([AVDEC, str(f264), str(out_yuv), "16"],
                           capture_output=True, text=True)
        assert "error" not in r.stderr, r.stderr
        raw = out_yuv.read_bytes()
        fsz = w * h * 3 // 2
        for i in range(3):
            fy = np.frombuffer(raw[i * fsz:i * fsz + w * h],
                               np.uint8).reshape(h, w)
            np.testing.assert_array_equal(fy, recons[i][0])


@pytest.mark.parametrize("cabac", [False, True])
def test_intra_in_p_conformant(tmp_path, cabac):
    """P frames evaluate an I16x16 candidate (analyse.c:2939): occluded /
    fresh content in a P frame must flip MBs to intra and stay conformant
    against both oracles (exact mixed-neighbor wavefront recon)."""
    w, h = 96, 64
    rng = np.random.default_rng(7)
    frames = moving_frames(3, w, h, seed=4)
    # frame 1/2: a region of brand-new content motion search can't find
    for i in (1, 2):
        frames[i][0][16:48, 32:80] = rng.integers(0, 256, (32, 48))
        frames[i][1][8:24, 16:40] = rng.integers(0, 256, (16, 24))
        frames[i][2][8:24, 16:40] = rng.integers(0, 256, (16, 24))
    p = param_default_preset("medium")
    p.width, p.height = w, h
    p.cabac = cabac
    p.bframe = 0
    p.deblocking_filter = True
    p.keyint_max = 250
    p.scenecut_threshold = 0       # force P even on the cut-like frame
    p.rc.rc_method = 0
    p.rc.qp_constant = 26
    p.full_recon = True
    p.threads = 1
    enc = Encoder(p)
    stream = annexb_bytes(enc.headers())
    recons = []
    for i, f in enumerate(frames):
        nals, out = enc.encode(Picture(f, pts=i))
        stream += annexb_bytes(nals)
        if out is not None:
            recons.append(out.recon)
    while enc.delayed_frames():
        nals, out = enc.encode(None)
        stream += annexb_bytes(nals)
        recons.append(out.recon)
    dec = refdec.Decoder()
    decoded = dec.decode(stream)
    assert dec.last_intra_map.any(), "no MB chose intra on fresh content"
    assert not dec.last_intra_map.all(), "every MB intra: decision broken"
    for i in range(3):
        for c in range(3):
            np.testing.assert_array_equal(decoded[i][c], recons[i][c],
                                          err_msg=f"frame {i} plane {c}")
    if _ensure_avdec():
        f264 = tmp_path / "ip.264"
        f264.write_bytes(stream)
        out_yuv = tmp_path / "ip.yuv"
        subprocess.run([AVDEC, str(f264), str(out_yuv)], check=True,
                       capture_output=True)
        raw = out_yuv.read_bytes()
        fsz = w * h * 3 // 2
        for i in range(3):
            fy = np.frombuffer(raw[i * fsz:i * fsz + w * h],
                               np.uint8).reshape(h, w)
            np.testing.assert_array_equal(fy, recons[i][0],
                                          err_msg=f"avdec frame {i}")
