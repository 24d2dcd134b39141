"""Benchmark: 1080p IPPP encode fps on one TPU chip.

Prints one JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.json north star): 10x realtime 1080p30 = 300 fps.
Current path: 1080p IPPP, batched HEX ME + qpel refine, CAVLC (milestone
config 2 equivalent); lookahead/B-frames/CABAC move this to medium-equiv.
"""

import json
import time

import numpy as np

TARGET_FPS = 300.0   # 10x realtime @ 30fps on one chip


def synth_1080p(n):
    rng = np.random.default_rng(0)
    h, w = 1088, 1920
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for i in range(n):
        y = np.clip(128 + 60 * np.sin(xx / 37 + i * .7) * np.cos(yy / 23)
                    + rng.integers(-8, 8, (h, w)), 0, 255).astype(np.uint8)
        u = np.clip(128 + 50 * np.sin(xx[::2, ::2] / 51), 0,
                    255).astype(np.uint8)
        v = np.clip(128 + 50 * np.cos(yy[::2, ::2] / 47), 0,
                    255).astype(np.uint8)
        frames.append([y, u, v])
    return frames


def main():
    from x264_tpu import param_default_preset
    from x264_tpu.encoder.encoder import Encoder, Picture, TYPE_IDR
    from x264_tpu.entropy.nal import annexb_bytes

    p = param_default_preset("medium")
    p.width, p.height = 1920, 1080
    p.cabac = False
    p.rc.rc_method = 0
    p.rc.qp_constant = 26
    enc = Encoder(p)

    frames = synth_1080p(4)
    # warmup (compiles I and P paths)
    enc.encode(Picture(frames[0], pts=0))
    enc.encode(Picture(frames[1], pts=1))
    n_bench = 16
    t0 = time.time()
    total_bytes = 0
    for i in range(n_bench):
        nals, out = enc.encode(Picture(frames[i % len(frames)], pts=i + 2))
        total_bytes += sum(len(n.payload) for n in nals)
    while enc.delayed_frames():
        nals, out = enc.encode(None)
        total_bytes += sum(len(n.payload) for n in nals)
    dt = time.time() - t0
    fps = n_bench / dt
    print(json.dumps({
        "metric": "encode_fps_1080p_ippp",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / TARGET_FPS, 4),
    }))


if __name__ == "__main__":
    main()
