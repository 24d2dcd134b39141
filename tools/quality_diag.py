"""Quality diagnosis: our encoder vs the reference binary, frame by frame.

Encodes the bench synthetic clip at matched CQP/IPPP/CAVLC settings with
both encoders, decodes both streams with libavcodec, and prints per-frame
(bits, PSNR) pairs plus totals — so the PSNR gap can be attributed
(I vs P, early vs late frames, bits spent vs quality reached).

Usage: python tools/quality_diag.py [WxH] [qp] [n_frames]
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def synth_clip(n, w, h):
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


def psnr(a, b):
    d = a.astype(np.float64) - b.astype(np.float64)
    mse = (d * d).mean()
    return 10 * np.log10(255.0 * 255.0 / max(mse, 1e-12))


def global_psnr(src, dec):
    return (6 * psnr(src[0], dec[0]) + psnr(src[1], dec[1])
            + psnr(src[2], dec[2])) / 8


def decode_all(path, w, h, n):
    tools = os.path.dirname(os.path.abspath(__file__))
    avdec = os.path.join(tools, "avdec")
    if not os.path.exists(avdec):
        subprocess.run(["gcc", "-O2", os.path.join(tools, "avdec.c"),
                        "-o", avdec, "-lavcodec", "-lavutil"], check=True)
    subprocess.run([avdec, path, path + ".yuv"], capture_output=True,
                   check=True)
    raw = open(path + ".yuv", "rb").read()
    fs = w * h * 3 // 2
    out = []
    for i in range(len(raw) // fs):
        buf = raw[i * fs:(i + 1) * fs]
        out.append([
            np.frombuffer(buf[:w * h], np.uint8).reshape(h, w),
            np.frombuffer(buf[w * h:w * h + w * h // 4],
                          np.uint8).reshape(h // 2, w // 2),
            np.frombuffer(buf[w * h + w * h // 4:],
                          np.uint8).reshape(h // 2, w // 2)])
    return out


def nal_sizes(stream):
    """Per-VCL-NAL byte sizes in order."""
    sizes = []
    i = 0
    marks = []
    while True:
        j = stream.find(b"\x00\x00\x01", i)
        if j < 0:
            break
        marks.append(j)
        i = j + 3
    marks.append(len(stream))
    for a, b in zip(marks[:-1], marks[1:]):
        ntype = stream[a + 3] & 0x1F
        if ntype in (1, 5):
            sizes.append(b - a)
    return sizes


def main():
    size = sys.argv[1] if len(sys.argv) > 1 else "640x352"
    qp = int(sys.argv[2]) if len(sys.argv) > 2 else 26
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    w, h = map(int, size.split("x"))
    frames = synth_clip(n, w, h)

    # ---- reference ----
    y4m = "/tmp/qd.y4m"
    with open(y4m, "wb") as f:
        f.write(f"YUV4MPEG2 W{w} H{h} F30:1 Ip A1:1 C420\n".encode())
        for y, u, v in frames:
            f.write(b"FRAME\n")
            f.write(y.tobytes())
            f.write(u.tobytes())
            f.write(v.tobytes())
    exe = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "refbuild", "x264")
    ref264 = "/tmp/qd_ref.264"
    subprocess.run([exe, "--preset", "veryfast", "--qp", str(qp),
                    "--no-cabac", "--bframes", "0", "--tune", "psnr",
                    "-o", ref264, y4m], capture_output=True, check=True)

    # ---- ours ----
    from x264_tpu import param_default_preset
    from x264_tpu.encoder.encoder import Encoder, Picture
    from x264_tpu.entropy.nal import annexb_bytes
    p = param_default_preset("medium")
    p.width, p.height = w, h
    p.cabac = False
    p.bframe = 0
    p.rc.rc_method = 0
    p.rc.qp_constant = qp
    p.analyse.psnr = False
    p.analyse.ssim = False
    enc = Encoder(p)
    stream = annexb_bytes(enc.headers())
    for i, f in enumerate(frames):
        nals, _ = enc.encode(Picture(f, pts=i))
        stream += annexb_bytes(nals)
    while enc.delayed_frames():
        nals, _ = enc.encode(None)
        stream += annexb_bytes(nals)
    ours264 = "/tmp/qd_ours.264"
    open(ours264, "wb").write(stream)

    dec_r = decode_all(ref264, w, h, n)
    dec_o = decode_all(ours264, w, h, n)
    sz_r = nal_sizes(open(ref264, "rb").read())
    sz_o = nal_sizes(stream)
    print(f"{'frm':>3} {'ref_B':>7} {'our_B':>7} {'ref_dB':>7} "
          f"{'our_dB':>7} {'d_dB':>6}")
    tr = to = 0
    pr, po = [], []
    for i in range(min(len(dec_r), len(dec_o), n)):
        qr = global_psnr(frames[i], dec_r[i])
        qo = global_psnr(frames[i], dec_o[i])
        pr.append(qr)
        po.append(qo)
        tr += sz_r[i]
        to += sz_o[i]
        print(f"{i:>3} {sz_r[i]:>7} {sz_o[i]:>7} {qr:>7.2f} {qo:>7.2f} "
              f"{qo - qr:>6.2f}")
    print(f"TOT {tr:>7} {to:>7} {np.mean(pr):>7.2f} {np.mean(po):>7.2f} "
          f"{np.mean(po) - np.mean(pr):>6.2f}")
    st = enc.stats.get("mb", {})
    print("our mb stats:", st)


if __name__ == "__main__":
    main()
