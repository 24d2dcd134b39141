"""Fast RD comparison harness: ours vs the reference binary on a small
synthetic clip, SAME metric for both sides (decode each stream with
tools/avdec, weighted-PSNR vs source). Prints a per-QP table + BD-rate.

Usage: python tools/rdcheck.py [--w 640] [--h 360] [--n 16] \
           [--qps 22,26,30] [--preset medium] [--cabac]

This is the quality-iteration loop (the full bench.py is 1080p and
compile-dominated); run it after any mode-decision/RC change.
"""

import argparse
import os
import subprocess
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
TOOLS = os.path.join(ROOT, "tools")


def synth_clip(n, w, h, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h + 64, 0:w + 64].astype(np.float32)
    base = (110 + 50 * np.sin(xx / 37) * np.cos(yy / 23)
            + 30 * np.sin((xx + 2 * yy) / 101)
            + rng.integers(-6, 7, xx.shape))
    frames = []
    for i in range(n):
        dx, dy = int(2.3 * i) % 32, int(1.1 * i) % 32
        y = np.clip(base[dy:dy + h, dx:dx + w]
                    + 20 * np.sin(xx[:h, :w] / 11 + i * 0.9), 0,
                    255).astype(np.uint8)
        u = np.clip(128 + 40 * np.sin((xx[:h:2, :w:2] + 3 * i) / 51), 0,
                    255).astype(np.uint8)
        v = np.clip(128 + 40 * np.cos((yy[:h:2, :w:2] - 2 * i) / 47), 0,
                    255).astype(np.uint8)
        frames.append([y, u, v])
    return frames


def avdec(path, w, h):
    exe = os.path.join(TOOLS, "avdec")
    if not os.path.exists(exe):
        subprocess.run(["gcc", "-O2", os.path.join(TOOLS, "avdec.c"),
                        "-o", exe, "-lavcodec", "-lavutil"],
                       capture_output=True, check=True)
    r = subprocess.run([exe, path, path + ".yuv"], capture_output=True,
                       text=True)
    assert "err=0" in (r.stderr + r.stdout), r.stderr[-300:]
    raw = open(path + ".yuv", "rb").read()
    fs = w * h * 3 // 2
    out = []
    for i in range(len(raw) // fs):
        buf = raw[i * fs:(i + 1) * fs]
        out.append([
            np.frombuffer(buf[:w * h], np.uint8).reshape(h, w),
            np.frombuffer(buf[w * h:w * h * 5 // 4],
                          np.uint8).reshape(h // 2, w // 2),
            np.frombuffer(buf[w * h * 5 // 4:],
                          np.uint8).reshape(h // 2, w // 2)])
    return out


def psnr(a, b):
    d = a.astype(np.float64) - b.astype(np.float64)
    return 10 * np.log10(255.0 ** 2 / max((d * d).mean(), 1e-12))


def wpsnr(src, dec):
    vals = [(6 * psnr(s[0], d[0]) + psnr(s[1], d[1]) + psnr(s[2], d[2]))
            / 8 for s, d in zip(src, dec)]
    return float(np.mean(vals))


def bd_rate(r1, p1, r2, p2):
    lr1, lr2 = np.log(np.asarray(r1)), np.log(np.asarray(r2))
    deg = min(3, len(r1) - 1)
    c1, c2 = np.polyfit(p1, lr1, deg), np.polyfit(p2, lr2, deg)
    lo, hi = max(min(p1), min(p2)), min(max(p1), max(p2))
    if hi <= lo:
        return None
    i1, i2 = np.polyint(c1), np.polyint(c2)
    a1 = (np.polyval(i1, hi) - np.polyval(i1, lo)) / (hi - lo)
    a2 = (np.polyval(i2, hi) - np.polyval(i2, lo)) / (hi - lo)
    return float((np.exp(a2 - a1) - 1) * 100)


def encode_ours(frames, qp, w, h, preset, cabac, bframes=0):
    from x264_tpu import param_default_preset
    from x264_tpu.encoder.encoder import Encoder, Picture
    p = param_default_preset(preset)
    p.width, p.height = w, h
    p.cabac = cabac
    p.bframe = bframes
    p.rc.rc_method = 0
    p.rc.qp_constant = qp
    p.analyse.psnr = False
    p.analyse.ssim = False
    enc = Encoder(p)
    data = b""
    for n in enc.headers():
        data += b"\x00\x00\x00\x01" + n.payload
    t0 = time.time()
    nb = 0
    for i, f in enumerate(frames):
        nals, out = enc.encode(Picture(f, pts=i))
        for n in nals:
            data += b"\x00\x00\x00\x01" + n.payload
        nb += 1
    while enc.delayed_frames():
        nals, _ = enc.encode(None)
        for n in nals:
            data += b"\x00\x00\x00\x01" + n.payload
    dt = time.time() - t0
    path = f"/tmp/rdc_ours_q{qp}.264"
    open(path, "wb").write(data)
    kbps = len(data) * 8 * 30.0 / len(frames) / 1000.0
    return path, kbps, dt, enc


def ref_binary():
    exe = os.path.join(TOOLS, "refbuild", "x264")
    if not os.path.exists(exe):
        bdir = os.path.dirname(exe)
        os.makedirs(bdir, exist_ok=True)
        subprocess.run(["/root/reference/configure", "--disable-asm",
                        "--disable-opencl", "--disable-avs",
                        "--disable-lavf", "--disable-ffms",
                        "--disable-gpac", "--disable-lsmash"],
                       cwd=bdir, capture_output=True, check=True)
        subprocess.run(["make", "-j8", "x264"], cwd=bdir,
                       capture_output=True, check=True)
    return exe


def encode_ref(y4m, qp, preset, cabac, bframes=0, extra=()):
    path = f"/tmp/rdc_ref_q{qp}.264"
    args = [ref_binary(), "--preset", preset, "--qp", str(qp),
            "--bframes", str(bframes), "--tune", "psnr",
            "-o", path, y4m]
    if not cabac:
        args.insert(1, "--no-cabac")
    args += list(extra)
    r = subprocess.run(args, capture_output=True, text=True, timeout=600)
    assert os.path.exists(path), r.stderr[-300:]
    kbps = os.path.getsize(path) * 8 * 30.0 / N_FRAMES_G / 1000.0
    return path, kbps


N_FRAMES_G = 16


def main():
    global N_FRAMES_G
    ap = argparse.ArgumentParser()
    ap.add_argument("--w", type=int, default=640)
    ap.add_argument("--h", type=int, default=368)
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--qps", default="22,26,30")
    ap.add_argument("--preset", default="medium")
    ap.add_argument("--ref-preset", default=None,
                    help="reference preset (default: same as ours)")
    ap.add_argument("--cabac", action="store_true")
    ap.add_argument("--bframes", type=int, default=0)
    args = ap.parse_args()
    w, h, n = args.w, args.h, args.n
    N_FRAMES_G = n
    qps = [int(q) for q in args.qps.split(",")]
    frames = synth_clip(n, w, h)
    y4m = "/tmp/rdc_src.y4m"
    with open(y4m, "wb") as f:
        f.write(f"YUV4MPEG2 W{w} H{h} F30:1 Ip A1:1 C420\n".encode())
        for y, u, v in frames:
            f.write(b"FRAME\n" + y.tobytes() + u.tobytes() + v.tobytes())
    ro, po, rr, pr = [], [], [], []
    print(f"{'QP':>4} {'ours kbps':>10} {'ours dB':>8} {'ref kbps':>10} "
          f"{'ref dB':>8} {'dkbps%':>7} {'ddB':>6}")
    for qp in qps:
        path_o, kbps_o, dt, enc = encode_ours(frames, qp, w, h,
                                              args.preset, args.cabac,
                                              args.bframes)
        p_o = wpsnr(frames, avdec(path_o, w, h))
        path_r, kbps_r = encode_ref(y4m, qp, args.ref_preset
                                    or args.preset, args.cabac,
                                    args.bframes)
        p_r = wpsnr(frames, avdec(path_r, w, h))
        ro.append(kbps_o)
        po.append(p_o)
        rr.append(kbps_r)
        pr.append(p_r)
        print(f"{qp:>4} {kbps_o:>10.1f} {p_o:>8.3f} {kbps_r:>10.1f} "
              f"{p_r:>8.3f} {100*(kbps_o/kbps_r-1):>6.1f}% "
              f"{p_o-p_r:>6.3f}")
    bd = bd_rate(rr, pr, ro, po)
    print(f"BD-rate vs reference: "
          f"{'n/a (no overlap)' if bd is None else f'{bd:+.1f}%'}")


if __name__ == "__main__":
    main()
