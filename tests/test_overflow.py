"""Payload-cap overflow re-encode (reference encoder.c:2893-2902).

When the device CAVLC buffer overflows, the encoder must re-encode the
frame at higher QP (not raise), repair the DPB, and re-dispatch in-flight
frames so the stream stays bit-exact against an independent decoder."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import refdec  # noqa: E402

from x264_tpu import param_default_preset  # noqa: E402
from x264_tpu.encoder import intra  # noqa: E402
from x264_tpu.encoder.encoder import Encoder, Picture  # noqa: E402


def _clip(n=5, w=96, h=64):
    rng = np.random.default_rng(11)
    frames = []
    for i in range(n):
        y = rng.integers(0, 256, (h, w)).astype(np.uint8)
        u = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
        v = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
        frames.append([y, u, v])
    return frames


@pytest.mark.slow
@pytest.mark.parametrize("threads", [1, 0])
def test_overflow_reencode_conformant(monkeypatch, threads):
    # small per-MB budget: noise frames at low QP overflow it (~3700
    # bits/MB at qp12), higher-QP retries fit (~900 bits/MB at qp44)
    from x264_tpu.encoder import inter
    monkeypatch.setattr(intra, "cap_bytes_per_mb", lambda qp: 128)
    monkeypatch.setattr(inter, "cap_bytes_per_mb", lambda qp: 128)
    p = param_default_preset("veryfast")
    p.width, p.height = 96, 64
    p.cabac = False
    p.bframe = 0     # IPPP: refdec has no B decode yet
    p.threads = threads
    p.rc.rc_method = 0
    p.rc.qp_constant = 12
    enc = Encoder(p)
    frames = _clip()
    nals_all, recons, qps = [], [], []
    for i, f in enumerate(frames):
        nals, out = enc.encode(Picture(f, pts=i))
        if out is not None:
            nals_all += nals
            recons.append(out.recon)
            qps.append(out.qp)
    while enc.delayed_frames():
        nals, out = enc.encode(None)
        nals_all += nals
        recons.append(out.recon)
        qps.append(out.qp)
    # at least one frame must have been bumped above the requested QP
    assert max(qps) > 12, qps

    data = b""
    for n in enc.headers() + nals_all:
        data += b"\x00\x00\x00\x01" + n.payload
    decoded = refdec.Decoder().decode(data)
    assert len(decoded) == len(recons)
    for i, (df, rec) in enumerate(zip(decoded, recons)):
        for pi in range(3):
            assert np.array_equal(np.asarray(df[pi]), np.asarray(rec[pi])), \
                f"frame {i} plane {pi}"
