"""Profile the exact bench.py single-stream path on the real chip:
compile wall time, steady-state per-frame, and stage breakdown."""
import time

import numpy as np


def main():
    import jax
    from x264_tpu import param_default_preset
    from x264_tpu.encoder.encoder import Encoder, Picture
    import bench

    frames = bench.synth_clip(8)
    p = param_default_preset("medium")
    p.width, p.height = 1920, 1080
    p.cabac = False
    p.bframe = 0
    p.rc.rc_method = 0
    p.rc.qp_constant = 26
    p.analyse.psnr = False
    p.analyse.ssim = False

    enc = Encoder(p)
    t0 = time.time()
    for i in range(4):
        t1 = time.time()
        enc.encode(Picture(frames[i], pts=i))
        print(f"frame {i}: {time.time()-t1:6.2f}s", flush=True)
    while enc.delayed_frames():
        enc.encode(None)
    print(f"compile+4: {time.time()-t0:6.1f}s", flush=True)

    # steady state
    t0 = time.time()
    n = 12
    for i in range(n):
        enc.encode(Picture(frames[i % 8], pts=100 + i))
    dt = time.time() - t0
    print(f"steady: {dt/n*1000:8.1f} ms/frame = {n/dt:.3f} fps", flush=True)

    # stage breakdown of the P path
    import jax.numpy as jnp
    from x264_tpu.encoder import inter, intra
    from x264_tpu.ops import mc
    from x264_tpu.ops.tables import chroma_qp
    mbw, mbh = enc.mb_w, enc.mb_h
    planes = enc._pad_to_mb(frames[1])
    y, u, v = [jnp.asarray(x) for x in planes]
    qp = 26
    qp_mb = jnp.full((mbh, mbw), qp, jnp.int32)
    qpc_mb = jnp.asarray(chroma_qp(np.full((mbh, mbw), qp), 0), jnp.int32)
    ref = enc._dpb[-1]

    def t(fn, n=6):
        r = fn()
        jax.block_until_ready(r)
        np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
        t0 = time.time()
        for _ in range(n):
            r = fn()
            jax.block_until_ready(r)
        np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
        return (time.time() - t0) / n * 1e3

    lam = max(1, int(round(2.0 ** ((qp - 12) / 6.0))))
    me_range = min(p.analyse.me_range, mc.PAD - 20)
    ms = jax.jit(lambda: inter.motion_search_seeded(ref["y_pad"], y, lam,
                                                    me_range, shapes=True))
    print(f"motion_search_seeded+shapes {t(ms):8.1f} ms", flush=True)
    dm = jax.jit(lambda: intra.decide_modes_full(y, u, v))
    print(f"decide_modes_full           {t(dm):8.1f} ms", flush=True)
    lam_mb = jnp.full((mbh, mbw), lam, jnp.int32)
    di4 = jax.jit(lambda: intra.decide_modes_i4(y, lam=lam_mb))
    print(f"decide_modes_i4             {t(di4):8.1f} ms", flush=True)
    hp = jax.jit(lambda: mc.hpel_planes(mc.pad_plane(y.astype(jnp.uint8))))
    print(f"hpel+pad (DPB push)         {t(hp):8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
