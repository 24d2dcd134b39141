"""Two-reference P frames (x264 --ref 2; reference analyse.c multi-ref
loop, cavlc.c:510 / cabac.c ref_idx coding, spec 8.4.1.3 refIdx-aware
MVP and 8.7.2.1 different-ref deblock strength).

The clip alternates two patterns so the 2-frames-back reference matches
far better than the previous frame — MBs genuinely select ref 1, which
the tests assert, and the streams stay two-oracle conformant."""

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


def _clip(n=8):
    """Alternating-pattern clip. The texture noise is baked INTO the two
    patterns (not regenerated per frame): the 2-frames-back reference
    then matches near-exactly, so multi-ref genuinely wins in RD terms.
    (Per-frame regenerated noise — the r4 version — makes 2-ref RD-WORSE
    even for the reference x264 binary: its qp27 ref=2 point sat 0.09 dB
    below its own ref=1 curve, because the ref1 residual is pure noise
    that quantizes away while PSNR is measured against the noisy
    source.)"""
    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:H, 0:W]
    base_a = np.clip(110 + 70 * np.sin(xx / 9) * np.cos(yy / 7)
                     + rng.integers(-6, 6, (H, W)), 0, 255)
    base_b = np.clip(110 + 70 * np.cos(xx / 13) * np.sin(yy / 11)
                     + rng.integers(-6, 6, (H, W)), 0, 255)
    cr_a = [rng.integers(100, 156, (H // 2, W // 2)).astype(np.uint8)
            for _ in range(2)]
    cr_b = [rng.integers(100, 156, (H // 2, W // 2)).astype(np.uint8)
            for _ in range(2)]
    frames = []
    for i in range(n):
        b = base_a if i % 2 == 0 else base_b
        u, v = cr_a if i % 2 == 0 else cr_b
        y = np.roll(b, (i // 2) * 2, axis=1).astype(np.uint8)
        u = np.roll(u, i // 2, axis=1)       # chroma tracks the pan
        v = np.roll(v, i // 2, axis=1)
        frames.append([y, u, v])
    return frames


def _encode(frames, cabac, nref, wp=0, qp=27):
    p = param_default_preset("medium")     # partitions + I4 on
    p.width, p.height = W, H
    p.cabac = cabac
    p.bframe = 0
    p.frame_reference = nref
    p.scenecut_threshold = 0
    p.rc.rc_method = 0
    p.rc.qp_constant = qp
    p.analyse.weighted_pred = wp
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
    for nal in enc.headers() + nals_all:
        data += b"\x00\x00\x00\x01" + nal.payload
    return data, outs


def _check_conformance(data, outs, tmp_path):
    sys.path.insert(0, os.path.dirname(AVDEC))
    import refdec
    rframes = refdec.Decoder().decode(data)
    assert len(rframes) == len(outs)
    for i, (rf, o) in enumerate(zip(rframes, outs)):
        for pi in range(3):
            assert np.array_equal(rf[pi], np.asarray(o.recon[pi])), \
                f"refdec frame {i} plane {pi}"
    bs = tmp_path / "m.264"
    out = tmp_path / "m.yuv"
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
                f"avdec display {disp} plane {pi}"


@pytest.mark.parametrize("cabac", [False, True])
def test_2ref_conformant(cabac, tmp_path):
    frames = _clip()
    data, outs = _encode(frames, cabac, nref=2)
    _check_conformance(data, outs, tmp_path)


def test_2ref_weightp_conformant(tmp_path):
    frames = _clip()
    data, outs = _encode(frames, False, nref=2, wp=1)
    _check_conformance(data, outs, tmp_path)


def test_2ref_improves_alternating_content():
    """On alternating content 2-ref must RD-dominate the 1-ref curve.

    NOT an equal-QP PSNR compare: at matched QP the reference x264
    binary itself trades PSNR for bits here (medium/CAVLC/IPPP qp27 on
    this exact clip: ref=1 14020 B / 36.894 dB, ref=2 12610 B /
    36.471 dB — multi-ref converts to bit savings, not PSNR, because
    the ref1 match leaves only the per-frame noise as residual, which
    quantizes away). The honest assertion is that the 2-ref operating
    point sits ON OR ABOVE the 1-ref rate-distortion curve: encode
    1-ref at QP 26..28, interpolate its PSNR at the 2-ref rate, and
    require the 2-ref point to match or beat it."""
    frames = _clip()

    def ypsnr(outs):
        by_pts = {o.pts: o for o in outs}
        mse = np.mean([np.mean(
            (np.asarray(by_pts[i].recon[0]).astype(np.float64)
             - frames[i][0].astype(np.float64)) ** 2)
            for i in range(len(frames))])
        return 10 * np.log10(255 ** 2 / mse)

    curve = []                       # 1-ref RD curve, decreasing rate
    for qp in (26, 27, 28):
        d, o = _encode(frames, False, nref=1, qp=qp)
        curve.append((len(d), ypsnr(o)))
    d2, o2 = _encode(frames, False, nref=2, qp=27)
    r2, p2 = len(d2), ypsnr(o2)
    # meaningful bit savings vs 1-ref at the same QP (ref1 wins MBs)
    assert r2 < 0.95 * curve[1][0], (r2, curve[1][0])
    rates = np.array([c[0] for c in curve], np.float64)
    psnrs = np.array([c[1] for c in curve], np.float64)
    assert rates[0] > rates[1] > rates[2] > 0
    p1_at_r2 = np.interp(r2, rates[::-1], psnrs[::-1])
    assert p2 >= p1_at_r2 - 0.05, \
        (f"2-ref ({r2} B, {p2:.3f} dB) falls below the 1-ref RD curve "
         f"({p1_at_r2:.3f} dB at that rate)")
