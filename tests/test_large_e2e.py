"""CI-grade conformance at 416x240 (VERDICT r1: e2e coverage beyond 64x48
- exercises payload cap sizing, wavefront diagonal count, and scan
lengths at a realistic frame size)."""

import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "tools"))

import refdec  # noqa: E402

from x264_tpu import param_default_preset  # noqa: E402
from x264_tpu.encoder.encoder import Encoder, Picture  # noqa: E402
import pytest

pytestmark = pytest.mark.slow    # heavy e2e lane (default gate excludes: -m 'not slow')

AVDEC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools", "avdec")
W, H = 416, 240


def test_416x240_ippp_conformant(tmp_path):
    rng = np.random.default_rng(3)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    frames = []
    for i in range(3):
        y = np.clip(110 + 60 * np.sin(xx / 23 + i * .7) * np.cos(yy / 17)
                    + 25 * np.sin((xx + 2 * yy) / 97)
                    + rng.integers(-7, 7, (H, W)), 0, 255).astype(np.uint8)
        u = np.clip(128 + 40 * np.sin(xx[::2, ::2] / 31), 0,
                    255).astype(np.uint8)
        v = np.clip(128 + 40 * np.cos(yy[::2, ::2] / 41), 0,
                    255).astype(np.uint8)
        frames.append([y, u, v])
    p = param_default_preset("veryfast")
    p.width, p.height = W, H
    p.cabac = False
    p.bframe = 0
    p.threads = 1
    p.rc.rc_method = 0
    p.rc.qp_constant = 26
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
    # oracle 1: refdec
    dec = refdec.Decoder().decode(data)
    assert len(dec) == len(recons)
    for i, (df, rf) in enumerate(zip(dec, recons)):
        for pi in range(3):
            assert np.array_equal(np.asarray(df[pi]),
                                  np.asarray(rf[pi])), f"f{i} p{pi}"
    # oracle 2: libavcodec
    bs = tmp_path / "l.264"
    out = tmp_path / "l.yuv"
    bs.write_bytes(data)
    subprocess.run([AVDEC, str(bs), str(out)], check=True,
                   capture_output=True)
    raw = out.read_bytes()
    fsz = W * H * 3 // 2
    assert len(raw) // fsz == len(recons)
    for i, rf in enumerate(recons):
        b0 = raw[i * fsz:(i + 1) * fsz]
        y = np.frombuffer(b0[:W * H], np.uint8).reshape(H, W)
        assert np.array_equal(y, np.asarray(rf[0])), f"f{i}"
