"""End-to-end I16x16 intra conformance: encoder recon must equal what
independent decoders reconstruct from the bitstream (reference method:
doc/regression_test.txt)."""

import numpy as np
import pytest

from x264_tpu import param_default_preset
from x264_tpu.encoder.encoder import Encoder, Picture, TYPE_IDR
from x264_tpu.entropy.nal import annexb_bytes

import sys
import os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import refdec  # noqa: E402


def synth_frames(n, w, h, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    out = []
    for i in range(n):
        y = np.clip(128 + 60 * np.sin(xx / 23 + i) * np.cos(yy / 17)
                    + rng.integers(-8, 8, (h, w)), 0, 255).astype(np.uint8)
        u = np.clip(128 + 40 * np.sin(xx[::2, ::2] / 31 + i), 0,
                    255).astype(np.uint8)
        v = np.clip(128 + 40 * np.cos(yy[::2, ::2] / 29 - i), 0,
                    255).astype(np.uint8)
        out.append([y, u, v])
    return out


def encode(frames, w, h, qp=26):
    p = param_default_preset("medium")
    p.width, p.height = w, h
    p.cabac = False
    p.bframe = 0     # IPPP: refdec has no B decode yet
    p.deblocking_filter = False
    p.rc.rc_method = 0
    p.rc.qp_constant = qp
    p.full_recon = True
    p.threads = 1
    enc = Encoder(p)
    stream = annexb_bytes(enc.headers())
    recons = []
    for i, f in enumerate(frames):
        nals, out = enc.encode(Picture(f, pts=i, i_type=TYPE_IDR))
        stream += annexb_bytes(nals)
        recons.append(out.recon)
    return stream, recons


def test_i16x16_conformance_refdec(tmp_path):
    w, h = 64, 48
    frames = synth_frames(2, w, h)
    stream, recons = encode(frames, w, h)
    decoded = refdec.Decoder().decode(stream)
    assert len(decoded) == 2
    for i in range(2):
        for c in range(3):
            np.testing.assert_array_equal(
                decoded[i][c], recons[i][c],
                err_msg=f"frame {i} plane {c}")
    # quality sanity: recon should be close to source at qp26
    psnr = 10 * np.log10(
        255 ** 2 / np.mean((recons[0][0].astype(float)
                            - frames[0][0].astype(float)) ** 2))
    assert psnr > 32, psnr


def test_i16x16_conformance_cv2(tmp_path):
    cv2 = pytest.importorskip("cv2")
    w, h = 64, 48
    frames = synth_frames(2, w, h, seed=5)
    stream, recons = encode(frames, w, h, qp=30)
    path = tmp_path / "i16.264"
    path.write_bytes(stream)
    cap = cv2.VideoCapture(str(path))
    cap.set(cv2.CAP_PROP_CONVERT_RGB, 0)
    for i in range(2):
        ret, img = cap.read()
        assert ret
        np.testing.assert_array_equal(np.asarray(img).squeeze(),
                                      recons[i][0])


def test_i16x16_qp_sweep_sizes():
    """Conformance across qp range on a non-MB-aligned frame."""
    w, h = 60, 36   # crop path
    frames = synth_frames(1, w, h, seed=9)
    for qp in (8, 40, 51):
        stream, recons = encode(frames, w, h, qp=qp)
        decoded = refdec.Decoder().decode(stream)
        for c in range(3):
            np.testing.assert_array_equal(decoded[0][c], recons[0][c],
                                          err_msg=f"qp {qp} plane {c}")
