"""SEI suite + HRD tests (reference encoder/set.c:574-874)."""

import pytest
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from x264_tpu import param_default_preset  # noqa: E402
from x264_tpu.encoder.encoder import Encoder, Picture  # noqa: E402

AVDEC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools", "avdec")
W, H = 64, 48


def _encode(p):
    rng = np.random.default_rng(0)
    enc = Encoder(p)
    nals_all, recons = [], []
    for i in range(4):
        f = [rng.integers(0, 256, (H, W)).astype(np.uint8),
             rng.integers(0, 256, (H // 2, W // 2)).astype(np.uint8),
             rng.integers(0, 256, (H // 2, W // 2)).astype(np.uint8)]
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


def _base_params():
    p = param_default_preset("veryfast")
    p.width, p.height = W, H
    p.cabac = False
    p.bframe = 0
    p.threads = 1
    p.rc.rc_method = 0
    p.rc.qp_constant = 30
    return p


def _conformant(data, recons, tmp_path):
    bs = tmp_path / "s.264"
    out = tmp_path / "s.yuv"
    bs.write_bytes(data)
    subprocess.run([AVDEC, str(bs), str(out)], check=True,
                   capture_output=True)
    raw = out.read_bytes()
    fsz = W * H * 3 // 2
    assert len(raw) // fsz == len(recons)
    for i, rec in enumerate(recons):
        b0 = raw[i * fsz:(i + 1) * fsz]
        y = np.frombuffer(b0[:W * H], np.uint8).reshape(H, W)
        assert np.array_equal(y, np.asarray(rec[0])), f"frame {i}"


@pytest.mark.slow
def test_hrd_seis_decodable(tmp_path):
    import x264_tpu.params as P
    p = _base_params()
    p.nal_hrd = P.NAL_HRD_VBR
    p.rc.vbv_max_bitrate = 500
    p.rc.vbv_buffer_size = 300
    data, recons = _encode(p)
    # SPS carries HRD; buffering-period (t0) + pic-timing (t1) SEIs exist
    assert data.count(b"\x00\x00\x00\x01\x06") >= 5   # SEI NALs
    _conformant(data, recons, tmp_path)


def test_display_metadata_seis(tmp_path):
    p = _base_params()
    p.frame_packing = 3
    p.mastering_display = ("G(13250,34500)B(7500,3000)R(34000,16000)"
                           "WP(15635,16450)L(10000000,1)")
    p.content_light_level = "1000,400"
    p.alternative_transfer = 18
    data, recons = _encode(p)
    _conformant(data, recons, tmp_path)


def test_sei_payload_syntax():
    from x264_tpu.entropy import sets
    fp = sets.sei_frame_packing(3)
    assert fp[0] == 45                  # payload type
    md = sets.sei_mastering_display(
        [(13250, 34500), (7500, 3000), (34000, 16000)],
        (15635, 16450), 10000000, 1)
    assert md[0] == 137 and md[1] == 24   # fixed 24-byte payload
    cll = sets.sei_content_light_level(1000, 400)
    assert cll[0] == 144 and cll[1] == 4
