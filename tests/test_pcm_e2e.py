"""End-to-end first-light test: I_PCM stream decodable by an independent
decoder (cv2/ffmpeg), Y plane bit-exact (conformance method of
doc/regression_test.txt adapted: decoder output == encoder recon)."""

import numpy as np
import pytest

from x264_tpu import param_default_preset
from x264_tpu.encoder.encoder import Encoder, Picture, TYPE_IDR
from x264_tpu.entropy.nal import annexb_bytes

cv2 = pytest.importorskip("cv2")


def make_frames(n, w, h, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        out.append([rng.integers(0, 256, (h, w)).astype(np.uint8),
                    rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8),
                    rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)])
    return out


def encode_stream(p, frames, force_type=TYPE_IDR):
    p.full_recon = True
    p.threads = 1
    enc = Encoder(p)
    stream = annexb_bytes(enc.headers())
    recons = []
    for i, f in enumerate(frames):
        nals, out = enc.encode(Picture(f, pts=i, i_type=force_type))
        stream += annexb_bytes(nals)
        recons.append(out.recon)
    return stream, recons, enc


def decode_y_cv2(path, n_frames):
    cap = cv2.VideoCapture(str(path))
    assert cap.isOpened()
    cap.set(cv2.CAP_PROP_CONVERT_RGB, 0)
    ys = []
    for _ in range(n_frames):
        ret, img = cap.read()
        if not ret:
            break
        ys.append(np.asarray(img).squeeze())
    return ys


def test_pcm_roundtrip_cv2(tmp_path):
    w, h = 64, 48
    frames = make_frames(3, w, h)
    p = param_default_preset("ultrafast")
    p.width, p.height = w, h
    p.force_pcm = True
    stream, recons, enc = encode_stream(p, frames)
    path = tmp_path / "pcm.264"
    path.write_bytes(stream)
    ys = decode_y_cv2(path, 3)
    assert len(ys) == 3
    for i in range(3):
        np.testing.assert_array_equal(ys[i], frames[i][0])
        # PCM recon is identical to the source
        np.testing.assert_array_equal(recons[i][0], frames[i][0])
        np.testing.assert_array_equal(recons[i][1], frames[i][1])


def test_pcm_nonaligned_size(tmp_path):
    # 60x34 -> 4x3 MBs with crop; decoder must report display size
    w, h = 60, 34
    frames = make_frames(2, w, h, seed=3)
    p = param_default_preset("ultrafast")
    p.width, p.height = w, h
    p.force_pcm = True
    stream, recons, enc = encode_stream(p, frames)
    path = tmp_path / "pcm2.264"
    path.write_bytes(stream)
    cap = cv2.VideoCapture(str(path))
    cap.set(cv2.CAP_PROP_CONVERT_RGB, 0)
    ret, img = cap.read()
    assert ret
    img = np.asarray(img).squeeze()
    assert img.shape == (h, w)
    np.testing.assert_array_equal(img, frames[0][0])
