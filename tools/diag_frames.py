"""Per-frame diagnostic: ours vs reference at one QP — frame type,
bytes, and PSNR per frame, so quality gaps can be localized (I vs P,
drift over the GOP, bit overhead per frame type).

Usage: JAX_PLATFORMS=cpu python tools/diag_frames.py [--qp 26]
"""

import argparse
import os
import subprocess
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from rdcheck import (avdec, encode_ours, encode_ref, psnr, ref_binary,
                     synth_clip, wpsnr)  # noqa: E402


def per_frame(path, frames, w, h):
    dec = avdec(path, w, h)
    rows = []
    for i, (d, s) in enumerate(zip(dec, frames)):
        rows.append((6 * psnr(s[0], d[0]) + psnr(s[1], d[1])
                     + psnr(s[2], d[2])) / 8)
    return rows


def nal_sizes(path):
    data = open(path, "rb").read()
    # split on start codes
    import re
    pos = [m.start() for m in re.finditer(b"\x00\x00\x01", data)]
    sizes = []
    for i, p in enumerate(pos):
        end = pos[i + 1] if i + 1 < len(pos) else len(data)
        nt = data[p + 3] & 0x1F
        sizes.append((nt, end - p))
    # keep slices only (type 1/5), merged per frame (no multi-slice here)
    return [(t, s) for t, s in sizes if t in (1, 5)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--qp", type=int, default=26)
    ap.add_argument("--w", type=int, default=640)
    ap.add_argument("--h", type=int, default=368)
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--preset", default="medium")
    a = ap.parse_args()
    frames = synth_clip(a.n, a.w, a.h)
    y4m = "/tmp/diag_src.y4m"
    with open(y4m, "wb") as f:
        f.write(f"YUV4MPEG2 W{a.w} H{a.h} F30:1 Ip A1:1 C420\n".encode())
        for y, u, v in frames:
            f.write(b"FRAME\n" + y.tobytes() + u.tobytes() + v.tobytes())

    ours = "/tmp/diag_ours.264"
    kbps_o, _ = encode_ours(frames, a.qp, a.w, a.h, a.preset, False,
                            out_path=ours) if "out_path" in \
        encode_ours.__code__.co_varnames else (None, None)
    if kbps_o is None:
        # encode_ours may not expose out_path; inline it
        from x264_tpu import param_default_preset
        from x264_tpu.encoder.encoder import Encoder, Picture
        p = param_default_preset(a.preset)
        p.width, p.height = a.w, a.h
        p.cabac = False
        p.bframe = 0
        p.rc.rc_method = 0
        p.rc.qp_constant = a.qp
        enc = Encoder(p)
        data = b""
        for n in enc.headers():
            data += b"\x00\x00\x00\x01" + n.payload
        for i in range(a.n):
            nals, _ = enc.encode(Picture(frames[i], pts=i))
            for n in nals:
                data += b"\x00\x00\x00\x01" + n.payload
        while enc.delayed_frames():
            nals, _ = enc.encode(None)
            for n in nals:
                data += b"\x00\x00\x00\x01" + n.payload
        open(ours, "wb").write(data)

    refp = "/tmp/diag_ref.264"
    exe = ref_binary()
    subprocess.run(
        [exe, "--preset", a.preset, "--qp", str(a.qp), "--no-cabac",
         "--bframes", "0", "--tune", "psnr", "-o", refp, y4m],
        capture_output=True, timeout=300)

    po = per_frame(ours, frames, a.w, a.h)
    pr = per_frame(refp, frames, a.w, a.h)
    so = nal_sizes(ours)
    sr = nal_sizes(refp)
    print(f"{'i':>3} {'typ':>3} {'ours_B':>8} {'ref_B':>8} "
          f"{'ours_dB':>8} {'ref_dB':>8} {'d_dB':>6}")
    for i in range(min(len(po), len(pr), len(so), len(sr))):
        print(f"{i:>3} {so[i][0]:>3} {so[i][1]:>8} {sr[i][1]:>8} "
              f"{po[i]:>8.3f} {pr[i]:>8.3f} {po[i]-pr[i]:>6.3f}")
    print(f"tot bytes ours={sum(s for _, s in so)} "
          f"ref={sum(s for _, s in sr)} "
          f"mean dB ours={np.mean(po):.3f} ref={np.mean(pr):.3f}")


if __name__ == "__main__":
    main()
