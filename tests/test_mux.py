"""Container muxer tests (reference: output/{mp4,matroska,flv}*.c).

A lossless I_PCM encode is muxed into each container and decoded back with
OpenCV's ffmpeg backend; decoded pixels must equal the source exactly.
Host-only (no device work): PCM frames are written by the host bit writer.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from x264_tpu import param_default_preset  # noqa: E402
from x264_tpu.encoder.encoder import Encoder, Picture  # noqa: E402
from x264_tpu.io.output import open_output  # noqa: E402

cv2 = pytest.importorskip("cv2")

W, H, N = 64, 48, 3


def _frames():
    rng = np.random.default_rng(5)
    out = []
    for i in range(N):
        # smooth content: BGR<->YUV roundtrip in cv2 is lossy, so compare
        # via the YUV it decodes; PCM keeps our YUV bit-exact in the stream
        y = np.full((H, W), 60 + 40 * i, np.uint8)
        y[8:24, 8:40] = 200 - 30 * i
        u = np.full((H // 2, W // 2), 110 + 10 * i, np.uint8)
        v = np.full((H // 2, W // 2), 140 - 10 * i, np.uint8)
        out.append([y, u, v])
    return out


def _encode_to(path, muxer=None):
    p = param_default_preset("ultrafast")
    p.width, p.height = W, H
    p.force_pcm = True
    p.threads = 1
    p.keyint_max = 1          # PCM path is intra-only
    p.rc.rc_method = 0
    enc = Encoder(p)
    out = open_output(path, muxer)
    out.set_param(p)
    out.write_headers(enc.headers())
    frames = _frames()
    for i, f in enumerate(frames):
        nals, po = enc.encode(Picture(f, pts=i))
        if nals:
            out.write_frame(nals, pts=po.pts, dts=po.dts)
    while enc.delayed_frames():
        nals, po = enc.encode(None)
        out.write_frame(nals, pts=po.pts, dts=po.dts)
    out.close()
    return frames


def _decode_yuv(path):
    cap = cv2.VideoCapture(path)
    out = []
    while True:
        ok, img = cap.read()
        if not ok:
            break
        yuv = cv2.cvtColor(img, cv2.COLOR_BGR2YUV_I420)
        y = yuv[:H]
        u = yuv[H:H + H // 4].reshape(H // 2, W // 2)
        v = yuv[H + H // 4:].reshape(H // 2, W // 2)
        out.append([y, u, v])
    cap.release()
    return out


@pytest.mark.parametrize("ext", ["mp4", "mkv", "flv"])
def test_mux_roundtrip(tmp_path, ext):
    path = str(tmp_path / f"out.{ext}")
    src = _encode_to(path)
    assert os.path.getsize(path) > 0
    dec = _decode_yuv(path)
    assert len(dec) == N, f"decoded {len(dec)} frames"
    for i, (s, d) in enumerate(zip(src, dec)):
        for pi in range(3):
            # cv2's BGR roundtrip is lossy by +-2; PCM content is flat so
            # tolerate small conversion error, not structural error
            assert np.max(np.abs(s[pi].astype(int) - d[pi].astype(int))) \
                <= 4, f"frame {i} plane {pi}"


def test_open_output_by_extension(tmp_path):
    from x264_tpu.io.mux import FLVOutput, MKVOutput, MP4Output
    from x264_tpu.io.output import RawOutput
    assert isinstance(open_output(str(tmp_path / "a.mp4")), MP4Output)
    assert isinstance(open_output(str(tmp_path / "a.mov")), MP4Output)
    assert isinstance(open_output(str(tmp_path / "a.mkv")), MKVOutput)
    assert isinstance(open_output(str(tmp_path / "a.flv")), FLVOutput)
    assert isinstance(open_output(str(tmp_path / "a.264")), RawOutput)
    assert isinstance(open_output(str(tmp_path / "a.mkv"), "raw"),
                      RawOutput)
