"""Benchmark: 1080p IPPP encode fps on one TPU chip + quality vs reference.

Prints one JSON line {"metric", "value", "unit", "vs_baseline", ...extras}.
Baseline target (BASELINE.json north star): 10x realtime 1080p30 = 300 fps.

Quality telemetry (VERDICT r1 item 6): the same clip is encoded by the
reference x264 binary (built on demand from /root/reference with
--disable-asm) at matched QP, and kbps/PSNR of both encoders ride along in
the JSON so quality regressions are visible to the driver.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

TARGET_FPS = 300.0   # 10x realtime @ 30fps on one chip
W, H = 1920, 1080
N_FRAMES = 24
QP = 26


def synth_clip(n, w=W, h=H):
    """Synthetic 1080p clip with global pan + local motion + noise
    (no real clips in the image; structure chosen so inter prediction,
    subpel and deblock all do real work)."""
    rng = np.random.default_rng(0)
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


def write_y4m(path, frames):
    with open(path, "wb") as f:
        f.write(f"YUV4MPEG2 W{W} H{H} F30:1 Ip A1:1 C420\n".encode())
        for y, u, v in frames:
            f.write(b"FRAME\n")
            f.write(y.tobytes())
            f.write(u.tobytes())
            f.write(v.tobytes())


def psnr(a, b):
    d = a.astype(np.float64) - b.astype(np.float64)
    mse = (d * d).mean()
    return 10 * np.log10(255.0 * 255.0 / max(mse, 1e-12))


def clip_psnr(src_frames, dec_frames):
    """Global PSNR (luma-weighted 6/8 Y + 1/8 U + 1/8 V, like x264)."""
    vals = []
    for (sy, su, sv), (dy, du, dv) in zip(src_frames, dec_frames):
        vals.append((6 * psnr(sy, dy) + psnr(su, du) + psnr(sv, dv)) / 8)
    return float(np.mean(vals))


def decode_with_cv2(path, n):
    import cv2
    cap = cv2.VideoCapture(path)
    out = []
    while True:
        ok, img = cap.read()
        if not ok:
            break
        # BGR -> YUV420 via cv2 (matches how we check conformance e2e)
        yuv = cv2.cvtColor(img, cv2.COLOR_BGR2YUV_I420)
        y = yuv[:H]
        u = yuv[H:H + H // 4].reshape(H // 2, W // 2)
        v = yuv[H + H // 4:].reshape(H // 2, W // 2)
        out.append([y, u, v])
    return out


def run_reference(y4m_path):
    """Encode the clip with the reference x264 binary at matched settings.
    Returns (kbps, psnr) or (None, None)."""
    exe = os.path.join(os.path.dirname(__file__), "tools", "refbuild",
                       "x264")
    if not os.path.exists(exe):
        bdir = os.path.dirname(exe)
        os.makedirs(bdir, exist_ok=True)
        try:
            subprocess.run(["/root/reference/configure", "--disable-asm",
                            "--disable-opencl", "--disable-avs",
                            "--disable-lavf", "--disable-ffms",
                            "--disable-gpac", "--disable-lsmash"],
                           cwd=bdir, capture_output=True, check=True,
                           timeout=300)
            subprocess.run(["make", "-j8", "x264"], cwd=bdir,
                           capture_output=True, check=True, timeout=600)
        except Exception:
            return None, None
    try:
        out = subprocess.run(
            [exe, "--preset", "veryfast", "--qp", str(QP), "--no-cabac",
             "--bframes", "0",
             "--psnr", "--tune", "psnr", "-o", "/tmp/bench_ref.264",
             y4m_path],
            capture_output=True, timeout=600, text=True)
        kbps = psnr_v = None
        for line in out.stderr.splitlines():
            if "PSNR Mean" in line and "kb/s:" in line:
                psnr_v = float(line.split("Global:")[1].split()[0])
                kbps = float(line.split("kb/s:")[1].strip())
        return kbps, psnr_v
    except Exception:
        return None, None


def worker(w, h):
    """Encode + measure in this process; prints the JSON line. Run in a
    child process by main() so a device-worker crash cannot take the
    whole benchmark down (the axon TPU worker has been observed to die
    on consecutive 1080p I+P programs; see main()'s retry ladder)."""
    global W, H
    W, H = w, h
    from x264_tpu import param_default_preset
    from x264_tpu.encoder.encoder import Encoder, Picture

    p = param_default_preset("medium")
    p.width, p.height = W, H
    p.cabac = False
    p.bframe = 0         # metric is IPPP; keep comparable across rounds
    p.rc.rc_method = 0
    p.rc.qp_constant = QP
    p.analyse.psnr = False
    p.analyse.ssim = False
    enc = Encoder(p)

    frames = synth_clip(N_FRAMES, W, H)
    # warmup (compiles I and P paths)
    enc.encode(Picture(frames[0], pts=0))
    enc.encode(Picture(frames[1], pts=1))

    n_bench = N_FRAMES
    t0 = time.time()
    total_bytes = 0
    nals_all = []
    for i in range(n_bench):
        # first benched frame is a forced IDR so the measured stream is
        # independently decodable (warmup NALs are discarded)
        pic = Picture(frames[i], pts=i + 2)
        if i == 0:
            pic.i_type = 1            # TYPE_IDR
        nals, out = enc.encode(pic)
        nals_all += nals
        total_bytes += sum(len(n.payload) + 4 for n in nals)
    while enc.delayed_frames():
        nals, out = enc.encode(None)
        nals_all += nals
        total_bytes += sum(len(n.payload) + 4 for n in nals)
    dt = time.time() - t0
    fps = n_bench / dt
    kbps = total_bytes * 8 * 30.0 / n_bench / 1000.0

    # ---- quality: decode our stream, PSNR vs source ----
    psnr_v = None
    try:
        data = b""
        for n in enc.headers() + nals_all:
            data += b"\x00\x00\x00\x01" + n.payload
        with open("/tmp/bench_tpu.264", "wb") as f:
            f.write(data)
        import cv2
        cap = cv2.VideoCapture("/tmp/bench_tpu.264")
        vals = []
        idx = 0
        while idx < n_bench:
            ok, img = cap.read()
            if not ok:
                break
            yuv = cv2.cvtColor(img, cv2.COLOR_BGR2YUV_I420)
            dy = yuv[:H]
            du = yuv[H:H + H // 4].reshape(H // 2, W // 2)
            dv = yuv[H + H // 4:].reshape(H // 2, W // 2)
            sy, su, sv = frames[idx]
            vals.append((6 * psnr(sy, dy) + psnr(su, du) + psnr(sv, dv))
                        / 8)
            idx += 1
        if vals:
            psnr_v = round(float(np.mean(vals)), 3)
    except Exception:
        pass

    ref_kbps = ref_psnr = None
    try:
        write_y4m("/tmp/bench_src.y4m", frames)
        ref_kbps, ref_psnr = run_reference("/tmp/bench_src.y4m")
    except Exception:
        pass

    scale = (1920 * 1080) / float(W * H)
    print(json.dumps({
        "metric": "encode_fps_1080p_ippp",
        "value": round(fps / scale, 3),   # normalized to 1080p px rate
        "unit": "fps",
        "vs_baseline": round(fps / scale / TARGET_FPS, 4),
        "resolution": f"{W}x{H}",
        "measured_fps": round(fps, 3),
        "kbps": round(kbps, 1),
        "psnr": psnr_v,
        "ref_kbps": ref_kbps,
        "ref_psnr": ref_psnr,
        "qp": QP,
    }))


def main():
    import subprocess
    ladder = [(1920, 1080), (1920, 1080), (1280, 720), (960, 544)]
    last_err = ""
    for (w, h) in ladder:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker",
             str(w), str(h)],
            capture_output=True, text=True, timeout=3000)
        for line in reversed(r.stdout.splitlines()):
            line = line.strip()
            if line.startswith("{"):
                print(line)
                return
        last_err = (r.stderr or "")[-400:]
    print(json.dumps({
        "metric": "encode_fps_1080p_ippp", "value": 0.0, "unit": "fps",
        "vs_baseline": 0.0, "error": "all bench configs crashed",
        "detail": last_err}))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]))
    else:
        main()
