#!/usr/bin/env python
"""Cross-revision bitstream regression (reference tools/test_x264.py /
digress): encode fixed synthetic vectors across a preset/option matrix and
print stream digests. Run on two git revisions and diff the output to catch
unintended bitstream changes.
"""

import hashlib
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from x264_tpu import param_default_preset, param_parse  # noqa: E402
from x264_tpu.encoder.encoder import Encoder, Picture  # noqa: E402
from x264_tpu.entropy.nal import annexb_bytes  # noqa: E402

MATRIX = [
    ("cqp26", ["qp=26"]),
    ("cqp26_cabac", ["qp=26", "cabac=1"]),
    ("cqp40_nodeblock", ["qp=40", "no-deblock=1"]),
    ("crf28_aq", ["crf=28"]),
    ("crf28_noaq", ["crf=28", "aq-mode=0"]),
    ("abr200", ["bitrate=200"]),
    ("keyint2", ["qp=30", "keyint=2"]),
    ("deblock_offsets", ["qp=30", "deblock=2:-1"]),
    ("bframes2", ["qp=28", "bframes=2", "no-scenecut=1"]),
    ("bframes2_cabac", ["qp=28", "bframes=2", "cabac=1",
                        "no-scenecut=1"]),
    ("vbv", ["bitrate=150", "vbv-maxrate=150", "vbv-bufsize=90"]),
    ("merange24", ["qp=30", "merange=24"]),
]
# presets swept on top of the option rows (reference test_x264.py:34-52)
PRESETS = ["ultrafast", "veryfast", "medium", "slow"]


def vectors(n=4, w=64, h=48):
    rng = np.random.default_rng(1234)
    yy, xx = np.mgrid[0:h, 0:w]
    out = []
    for i in range(n):
        y = np.clip(128 + 60 * np.sin((xx + 3 * i) / 17)
                    * np.cos((yy + 2 * i) / 13)
                    + rng.integers(-5, 5, (h, w)), 0, 255).astype(np.uint8)
        u = np.clip(128 + 40 * np.sin(xx[::2, ::2] / 19), 0,
                    255).astype(np.uint8)
        v = np.clip(128 + 40 * np.cos(yy[::2, ::2] / 23), 0,
                    255).astype(np.uint8)
        out.append([y, u, v])
    return out


def run_one(preset, name, opts, frames):
    p = param_default_preset(preset)
    p.width, p.height = 64, 48
    p.cabac = False
    p.bframe = 0
    p.threads = 1
    for kv in opts:
        k, _, v = kv.partition("=")
        param_parse(p, k, v)
    enc = Encoder(p)
    stream = annexb_bytes(enc.headers())
    for i, f in enumerate(frames):
        nals, _ = enc.encode(Picture(f, pts=i))
        stream += annexb_bytes(nals)
    while enc.delayed_frames():
        nals, _ = enc.encode(None)
        stream += annexb_bytes(nals)
    print(f"{preset}/{name}: {len(stream):6d} bytes "
          f"md5={hashlib.md5(stream).hexdigest()}")


def main():
    frames = vectors()
    presets = (PRESETS if "--presets" in sys.argv else ["medium"])
    for preset in presets:
        for name, opts in MATRIX:
            run_one(preset, name, opts, frames)


if __name__ == "__main__":
    main()
