"""Profile the 1080p encode path stage by stage on the real chip."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from x264_tpu import param_default_preset
from x264_tpu.encoder.encoder import Encoder, Picture


def synth(n, h=1088, w=1920):
    rng = np.random.default_rng(0)
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


def t(fn, n=5):
    fn()  # warm
    t0 = time.time()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    return (time.time() - t0) / n * 1000


def main():
    p = param_default_preset("medium")
    p.width, p.height = 1920, 1080
    p.cabac = False
    p.rc.rc_method = 0
    p.rc.qp_constant = 26
    enc = Encoder(p)
    frames = synth(3)

    # full frames first (compile)
    nals, _ = enc.encode(Picture(frames[0], pts=0))
    nals, _ = enc.encode(Picture(frames[1], pts=1))
    nals, _ = enc.encode(Picture(frames[2], pts=2))

    # whole-frame timings
    import x264_tpu.encoder.inter as inter
    import x264_tpu.encoder.intra as intra
    from x264_tpu.ops import mc
    from x264_tpu.ops.tables import chroma_qp

    mbw, mbh = enc.mb_w, enc.mb_h
    planes = enc._pad_to_mb(frames[1])
    y, u, v = [jnp.asarray(x) for x in planes]
    qp = 26
    qp_mb = jnp.full((mbh, mbw), qp, jnp.int32)
    qpc_mb = jnp.asarray(chroma_qp(np.full((mbh, mbw), qp), 0), jnp.int32)
    ref = enc._dpb[-1]
    lam = max(1, int(round(2.0 ** ((qp - 12) / 6.0))))
    me_range = min(p.analyse.me_range, mc.PAD - 20)
    from x264_tpu.encoder import wavefront
    sx_, sy_, sv_, dg_, ln_ = wavefront.schedule(mbw, mbh)
    sx, sy, sv = jnp.asarray(sx_), jnp.asarray(sy_), jnp.asarray(sv_)
    dg, ln = jnp.asarray(dg_), jnp.asarray(ln_)
    cap_words = (mbw * mbh * intra.CAP_BYTES_PER_MB) // 4

    # stage: motion search alone
    ms = jax.jit(lambda: inter.motion_search(ref["y_pad"], ref["hpel"],
                                             y, lam, me_range))
    print(f"motion_search        {t(ms):8.1f} ms")

    # stage: full P frame
    def pframe():
        return inter.encode_pframe_device(
            y, u, v, ref["y_pad"], ref["hpel"], ref["u_pad"], ref["v_pad"],
            qp_mb, qpc_mb, qp, lam, sx, sy, sv,
            mbw=mbw, mbh=mbh, cap_words=cap_words, me_range=me_range,
            deblock=True)
    print(f"P frame (full)       {t(pframe):8.1f} ms")

    def pframe_nodeblock():
        return inter.encode_pframe_device(
            y, u, v, ref["y_pad"], ref["hpel"], ref["u_pad"], ref["v_pad"],
            qp_mb, qpc_mb, qp, lam, sx, sy, sv,
            mbw=mbw, mbh=mbh, cap_words=cap_words, me_range=me_range,
            deblock=False)
    print(f"P frame (no deblock) {t(pframe_nodeblock):8.1f} ms")

    # stage: I frame
    def iframe():
        return intra.encode_iframe_device(
            y, u, v, qp_mb, qpc_mb, qp, sx, sy, sv, dg, ln,
            mbw=mbw, mbh=mbh, cap_words=cap_words, deblock=True)
    print(f"I frame (full)       {t(iframe):8.1f} ms")

    def iframe_nodeblock():
        return intra.encode_iframe_device(
            y, u, v, qp_mb, qpc_mb, qp, sx, sy, sv, dg, ln,
            mbw=mbw, mbh=mbh, cap_words=cap_words, deblock=False)
    print(f"I frame (no deblock) {t(iframe_nodeblock):8.1f} ms")

    dec = jax.jit(lambda: intra.decide_modes(y, u, v))
    print(f"I decide_modes       {t(dec):8.1f} ms")

    com = jax.jit(lambda: intra.commit_i16x16(
        y, u, v, dec()[0], dec()[1], qp_mb, qpc_mb, sx, sy, sv,
        mbw=mbw, mbh=mbh))
    print(f"I commit (wavefront) {t(com):8.1f} ms")

    # DPB push cost (hpel etc)
    def dpb():
        y_pad = mc.pad_plane(y.astype(jnp.uint8))
        return mc.hpel_planes(y_pad)
    print(f"hpel+pad (DPB push)  {t(jax.jit(dpb)):8.1f} ms")

    # full encoder path end to end
    def e2e():
        nals, _ = enc.encode(Picture(frames[1], pts=10))
        return nals
    e2e()
    t0 = time.time()
    for i in range(8):
        e2e()
    print(f"e2e P frame          {(time.time()-t0)/8*1000:8.1f} ms")


if __name__ == "__main__":
    main()
