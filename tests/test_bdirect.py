"""B_Direct_16x16 / B_Skip conformance (reference mvpred.c:290 spatial
direct, analyse.c B_SKIP decision).

Static content must produce skipped/direct B macroblocks (near-zero B
cost), and the fixed-point direct adoption must stay bit-exact against
both oracles. Also unit-tests the batched derivation against the
decoder's scalar mirror on random fields."""

import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "tools"))

from x264_tpu import param_default_preset  # noqa: E402
from x264_tpu.encoder.encoder import TYPE_B, Encoder, Picture  # noqa: E402

AVDEC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools", "avdec")
W, H = 96, 64


def test_derivation_matches_scalar_mirror():
    """Batched derive_direct == refdec's scalar _derive_direct_mb on
    random per-list fields (the conformance-critical invariant)."""
    import refdec

    from x264_tpu.encoder.bdirect import derive_direct
    rng = np.random.default_rng(3)
    mbh, mbw = 5, 7
    for trial in range(8):
        use0 = rng.random((mbh, mbw)) < 0.7
        use1 = rng.random((mbh, mbw)) < 0.7
        mv0 = np.where(use0[..., None],
                       rng.integers(-40, 40, (mbh, mbw, 2)), 0)
        mv1 = np.where(use1[..., None],
                       rng.integers(-40, 40, (mbh, mbw, 2)), 0)
        col_i = rng.random((mbh, mbw)) < 0.6
        col_m = rng.integers(-3, 3, (mbh, mbw, 2))
        du0, du1, dm0, dm1 = [np.asarray(a) for a in derive_direct(
            use0, use1, mv0, mv1, col_i, col_m)]
        dec = refdec.Decoder()
        for my in range(mbh):
            for mx in range(mbw):
                su0, su1, sm0, sm1 = dec._derive_direct_mb(
                    mv0.astype(np.int64), use0, mv1.astype(np.int64),
                    use1, mx, my, col_i, col_m.astype(np.int64))
                assert bool(du0[my, mx]) == su0, (trial, my, mx)
                assert bool(du1[my, mx]) == su1, (trial, my, mx)
                if su0:
                    assert np.array_equal(dm0[my, mx], sm0), (trial, my,
                                                              mx)
                if su1:
                    assert np.array_equal(dm1[my, mx], sm1), (trial, my,
                                                              mx)


def _static_clip(n):
    yy, xx = np.mgrid[0:H, 0:W]
    frames = []
    for i in range(n):
        y = np.clip(110 + 70 * np.sin(xx / 11) * np.cos(yy / 9), 0,
                    255).astype(np.uint8)
        y[30:40, 10 + 3 * i:20 + 3 * i] = 200    # small moving patch
        u = np.full((H // 2, W // 2), 120, np.uint8)
        v = np.full((H // 2, W // 2), 136, np.uint8)
        frames.append([y, u, v])
    return frames


@pytest.mark.parametrize("cabac", [False, True])
@pytest.mark.slow
def test_bskip_static_content(tmp_path, cabac):
    frames = _static_clip(7)
    p = param_default_preset("veryfast")
    p.width, p.height = W, H
    p.cabac = cabac
    p.threads = 1
    p.bframe = 2
    p.bframe_adaptive = 0
    p.scenecut_threshold = 0
    p.rc.rc_method = 0
    p.rc.qp_constant = 26
    p.full_recon = True
    enc = Encoder(p)
    nals_all, outs = [], []
    for i, f in enumerate(frames):
        nals, out = enc.encode(Picture(f, pts=i))
        if out is not None:
            nals_all += [(nals, out)]
            outs.append(out)
    while enc.delayed_frames():
        nals, out = enc.encode(None)
        nals_all += [(nals, out)]
        outs.append(out)
    assert TYPE_B in [o.i_type for o in outs]
    # B frames on static content must be tiny (mostly B_Skip runs)
    b_bytes = [sum(len(n.payload) for n in nals)
               for nals, o in nals_all if o.i_type == TYPE_B]
    # all-B_Skip frames: slice header + one skip run, a few dozen bytes
    assert b_bytes and min(b_bytes) < 48, b_bytes
    data = b"".join(b"\x00\x00\x00\x01" + n.payload
                    for n in enc.headers()
                    + [n for nals, _ in nals_all for n in nals])
    import refdec
    rframes = refdec.Decoder().decode(data)
    assert len(rframes) == len(outs)
    for i, (rf, o) in enumerate(zip(rframes, outs)):
        for pi in range(3):
            np.testing.assert_array_equal(
                rf[pi], np.asarray(o.recon[pi]),
                err_msg=f"refdec frame {i} plane {pi}")
    if os.path.exists(AVDEC):
        bs = tmp_path / "bd.264"
        bs.write_bytes(data)
        out_yuv = tmp_path / "bd.yuv"
        subprocess.run([AVDEC, str(bs), str(out_yuv)], check=True,
                       capture_output=True)
        raw = out_yuv.read_bytes()
        fsz = W * H * 3 // 2
        by_pts = {o.pts: o for o in outs}
        assert len(raw) // fsz == len(outs)
        for disp in range(len(outs)):
            b0 = raw[disp * fsz:(disp + 1) * fsz]
            dy = np.frombuffer(b0[:W * H], np.uint8).reshape(H, W)
            np.testing.assert_array_equal(
                dy, np.asarray(by_pts[disp].recon[0]),
                err_msg=f"avdec display {disp}")
