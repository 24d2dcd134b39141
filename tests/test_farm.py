"""Farm encoder validation (r3 verdict item 4): every stream of a
multi-stream farm run must (a) be byte-identical to the single-stream
Encoder at matched settings — the farm is the frame-threads throughput
axis, not a different encoder — and (b) decode bit-exactly in both
independent decoders (tools/refdec.py + libavcodec)."""

import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import refdec  # noqa: E402

from x264_tpu import param_default_preset  # noqa: E402
from x264_tpu.encoder.encoder import Encoder, Picture  # noqa: E402
from x264_tpu.encoder.farm import FarmEncoder  # noqa: E402
from x264_tpu.entropy.nal import annexb_bytes  # noqa: E402

pytestmark = pytest.mark.slow    # heavy e2e lane (default gate excludes: -m 'not slow')

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")
AVDEC = os.path.join(TOOLS, "avdec")

W, H, N, S = 64, 48, 4, 3


def _ensure_avdec():
    if os.path.exists(AVDEC):
        return True
    r = subprocess.run(
        ["gcc", "-O2", os.path.join(TOOLS, "avdec.c"), "-o", AVDEC,
         "-lavcodec", "-lavutil"], capture_output=True)
    return r.returncode == 0


def stream_frames(seed):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W]
    out = []
    for i in range(N):
        y = np.clip(120 + 70 * np.sin((xx + (2 + seed) * i) / 15)
                    * np.cos((yy + i) / 11)
                    + rng.integers(-5, 5, (H, W)), 0, 255).astype(np.uint8)
        u = np.clip(128 + 30 * np.sin((xx[::2, ::2] + seed + i) / 13), 0,
                    255).astype(np.uint8)
        v = np.clip(128 + 30 * np.cos((yy[::2, ::2] - i) / 17), 0,
                    255).astype(np.uint8)
        out.append([y, u, v])
    return out


def farm_params():
    p = param_default_preset("medium")
    p.width, p.height = W, H
    p.cabac = False
    p.bframe = 0
    p.rc.rc_method = 0
    p.rc.qp_constant = 27
    p.analyse.psnr = False
    p.analyse.ssim = False
    p.analyse.weighted_pred = 0   # the farm's one feature exception
    p.scenecut_threshold = 0
    p.keyint_max = 250
    p.threads = 1
    return p


@pytest.fixture(scope="module")
def farm_streams():
    clips = [stream_frames(s) for s in range(S)]
    farm = FarmEncoder(farm_params(), S)
    streams = [annexb_bytes(farm.headers()) for _ in range(S)]
    for i in range(N):
        outs = farm.encode_batch([clips[s][i] for s in range(S)],
                                 idr=(i == 0))
        for s in range(S):
            streams[s] += annexb_bytes(outs[s])
    return clips, streams


def test_farm_matches_single_stream(farm_streams):
    """Byte-identical to the single-stream Encoder at the same settings:
    the farm runs the SAME feature set (partitions/i4/intra-in-P/seeded
    ME), not a silently lighter one."""
    clips, streams = farm_streams
    for s in range(S):
        enc = Encoder(farm_params())
        single = annexb_bytes(enc.headers())
        for i, f in enumerate(clips[s]):
            nals, _ = enc.encode(Picture(f, pts=i))
            single += annexb_bytes(nals)
        while enc.delayed_frames():
            nals, _ = enc.encode(None)
            single += annexb_bytes(nals)
        assert single == streams[s], f"farm stream {s} != single-stream"


def test_farm_streams_conformant(farm_streams):
    """Every farm stream decodes in refdec; decoded pixels match
    libavcodec's decode bit-exactly (two independent oracles agree)."""
    clips, streams = farm_streams
    have_av = _ensure_avdec()
    for s in range(S):
        decoded = refdec.Decoder().decode(streams[s])
        assert len(decoded) == N
        if not have_av:
            continue
        f264 = f"/tmp/farm_{s}.264"
        open(f264, "wb").write(streams[s])
        r = subprocess.run([AVDEC, f264, f264 + ".yuv"],
                           capture_output=True, text=True)
        assert "err=0" in (r.stderr + r.stdout), r.stderr
        raw = open(f264 + ".yuv", "rb").read()
        fs = W * H * 3 // 2
        assert len(raw) == N * fs
        for i in range(N):
            buf = raw[i * fs:(i + 1) * fs]
            av_y = np.frombuffer(buf[:W * H], np.uint8).reshape(H, W)
            np.testing.assert_array_equal(
                decoded[i][0], av_y,
                err_msg=f"stream {s} frame {i}: refdec != libavcodec")
