"""Error-resilience wiring (r3 verdict item 5): invalidate_reference
without IDR must emit ref_pic_list_modification and stay conformant in
both oracles; weighted prediction must engage on fades and stay
conformant (identity fits must NOT emit a degenerate w=127 weight —
r3 weak item 9)."""

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

pytestmark = pytest.mark.slow    # heavy e2e lane (default gate excludes: -m 'not slow')

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")
AVDEC = os.path.join(TOOLS, "avdec")
W, H = 64, 48


def _ensure_avdec():
    if os.path.exists(AVDEC):
        return True
    r = subprocess.run(
        ["gcc", "-O2", os.path.join(TOOLS, "avdec.c"), "-o", AVDEC,
         "-lavcodec", "-lavutil"], capture_output=True)
    return r.returncode == 0


def make_params(weighted=0):
    p = param_default_preset("medium")
    p.width, p.height = W, H
    p.cabac = False
    p.bframe = 0
    p.rc.rc_method = 0
    p.rc.qp_constant = 26
    p.analyse.psnr = False
    p.analyse.ssim = False
    p.analyse.weighted_pred = weighted
    p.scenecut_threshold = 0
    p.keyint_max = 250
    p.threads = 1
    return p


def moving_frames(n, seed=0, fade=0.0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W]
    out = []
    for i in range(n):
        g = 1.0 - fade * i
        y = np.clip(g * (120 + 60 * np.sin((xx + 2 * i) / 15)
                         * np.cos((yy + i) / 11))
                    + rng.integers(-3, 3, (H, W)), 0, 255).astype(np.uint8)
        u = np.clip(128 + 30 * np.sin((xx[::2, ::2] + i) / 13), 0,
                    255).astype(np.uint8)
        v = np.clip(128 + 30 * np.cos((yy[::2, ::2] - i) / 17), 0,
                    255).astype(np.uint8)
        out.append([y, u, v])
    return out


def run_encoder(enc, frames, invalidate_at=None, invalidate_pts=None):
    stream = annexb_bytes(enc.headers())
    recons, types = [], []

    def take(nals, out):
        nonlocal stream
        stream += annexb_bytes(nals)
        if out is not None:
            recons.append(out.recon)
            types.append(out.i_type)
    for i, f in enumerate(frames):
        if invalidate_at is not None and i == invalidate_at:
            enc.invalidate_reference(invalidate_pts)
        take(*enc.encode(Picture(f, pts=i)))
    while enc.delayed_frames():
        take(*enc.encode(None))
    return stream, recons, types


def test_invalidate_emits_ref_list_mod_no_idr():
    """After invalidate_reference the encoder re-references an older DPB
    entry via ref_pic_list_modification instead of forcing an IDR, and
    the stream stays bit-exact in refdec (which applies the mod)."""
    frames = moving_frames(7, seed=2)
    enc = Encoder(make_params())
    # frames 0..3 encoded; with pipe depth 1 the dispatch of frame i
    # happens at encode(i); invalidate before frame 4's encode drops the
    # newest recon (frame 3) so frame 4 must re-reference frame 2
    stream, recons, types = run_encoder(enc, frames, invalidate_at=4,
                                        invalidate_pts=3)
    assert types[0] == 1 and all(t == 3 for t in types[1:]), types
    decoded = refdec.Decoder().decode(stream)
    assert len(decoded) == len(frames)
    for i in range(len(frames)):
        for c in range(3):
            np.testing.assert_array_equal(decoded[i][c], recons[i][c],
                                          err_msg=f"frame {i} plane {c}")
    if _ensure_avdec():
        open("/tmp/rlm.264", "wb").write(stream)
        r = subprocess.run([AVDEC, "/tmp/rlm.264", "/tmp/rlm.yuv"],
                           capture_output=True, text=True)
        assert "err=0" in (r.stderr + r.stdout), r.stderr
        raw = open("/tmp/rlm.yuv", "rb").read()
        fs = W * H * 3 // 2
        assert len(raw) == len(frames) * fs
        for i in range(len(frames)):
            av_y = np.frombuffer(raw[i * fs:i * fs + W * H],
                                 np.uint8).reshape(H, W)
            np.testing.assert_array_equal(
                recons[i][0], av_y, err_msg=f"frame {i}: libavcodec")


def test_weightp_fade_conformant():
    """A fade engages the luma weight fit; the weighted stream decodes
    bit-exact in refdec (which applies pred_weight_table)."""
    frames = moving_frames(6, seed=4, fade=0.12)
    enc = Encoder(make_params(weighted=1))
    stream, recons, types = run_encoder(enc, frames)
    assert enc.stats.get("weightp_frames", 0) > 0, \
        "fade did not engage weightp"
    decoded = refdec.Decoder().decode(stream)
    for i in range(len(frames)):
        for c in range(3):
            np.testing.assert_array_equal(decoded[i][c], recons[i][c],
                                          err_msg=f"frame {i} plane {c}")


def test_weightp_identity_not_emitted():
    """Static content: the fit is ~identity, so NO weight may be emitted
    (r3 weak item 9: the pre-clamp degraded identity to w=127)."""
    frames = moving_frames(4, seed=5, fade=0.0)
    enc = Encoder(make_params(weighted=1))
    run_encoder(enc, frames)
    assert enc.stats.get("weightp_frames", 0) == 0


def test_pir_sweep_conformant():
    """Periodic intra refresh (reference encoder.c:3626-3660): after the
    initial IDR every frame is P; the intra column band sweeps across the
    frame each keyint; sweep restarts emit a recovery-point SEI and are
    flagged keyframes; streams decode bit-exact in both oracles."""
    n = 10
    frames = moving_frames(n, seed=7)
    p = make_params()
    p.intra_refresh = True
    p.keyint_max = 4
    enc = Encoder(p)
    stream = annexb_bytes(enc.headers())
    recons, types, keyflags = [], [], []

    def take(nals, out):
        nonlocal stream
        stream += annexb_bytes(nals)
        if out is not None:
            recons.append(out.recon)
            types.append(out.i_type)
            keyflags.append(out.b_keyframe)
    for i, f in enumerate(frames):
        take(*enc.encode(Picture(f, pts=i)))
    while enc.delayed_frames():
        take(*enc.encode(None))
    # only the very first frame is IDR; all keyint boundaries become
    # sweep-restart P frames
    assert types[0] == 1 and all(t == 3 for t in types[1:]), types
    # sweep restarts every keyint: frames 4 and 8 are recovery points
    assert keyflags[0] and keyflags[4] and keyflags[8], keyflags
    assert not any(keyflags[i] for i in (1, 2, 3, 5, 6, 7, 9)), keyflags
    assert b"\x06" in stream  # SEI NALs present (recovery point)
    decoded = refdec.Decoder().decode(stream)
    assert len(decoded) == n
    for i in range(n):
        for c in range(3):
            np.testing.assert_array_equal(decoded[i][c], recons[i][c],
                                          err_msg=f"frame {i} plane {c}")
    if _ensure_avdec():
        open("/tmp/pir.264", "wb").write(stream)
        r = subprocess.run([AVDEC, "/tmp/pir.264", "/tmp/pir.yuv"],
                           capture_output=True, text=True)
        assert "err=0" in (r.stderr + r.stdout), r.stderr
        raw = open("/tmp/pir.yuv", "rb").read()
        fs = W * H * 3 // 2
        assert len(raw) == n * fs
        for i in range(n):
            av_y = np.frombuffer(raw[i * fs:i * fs + W * H],
                                 np.uint8).reshape(H, W)
            np.testing.assert_array_equal(
                recons[i][0], av_y, err_msg=f"frame {i}: libavcodec")


def test_pir_intra_refresh_api_queues_sweep():
    """x264_encoder_intra_refresh under PIR: the queued refresh restarts
    the column sweep at the next opportunity instead of forcing IDR."""
    frames = moving_frames(8, seed=9)
    p = make_params()
    p.intra_refresh = True
    p.keyint_max = 6
    enc = Encoder(p)
    stream = annexb_bytes(enc.headers())
    types, keyflags = [], []

    def take(nals, out):
        nonlocal stream
        stream += annexb_bytes(nals)
        if out is not None:
            types.append(out.i_type)
            keyflags.append(out.b_keyframe)
    for i, f in enumerate(frames):
        if i == 3:
            enc.intra_refresh()
        take(*enc.encode(Picture(f, pts=i)))
    while enc.delayed_frames():
        take(*enc.encode(None))
    assert types[0] == 1 and all(t == 3 for t in types[1:]), types
    # the queued refresh fires once the current sweep completes — a
    # restart must happen strictly before the natural keyint boundary
    # would have been hit a second time
    assert any(keyflags[1:6]), keyflags
    decoded = refdec.Decoder().decode(stream)
    assert len(decoded) == len(frames)
