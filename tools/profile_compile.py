"""Measure XLA compile time + steady-state run time of each major device
program at 1080p (the bench configuration), separately. Identifies where
the 395s warmup (BENCH_r04) is spent and what each frame costs.

Usage: PYTHONPATH=/root/repo python tools/profile_compile.py [--farm S]
"""
import sys
import time

import numpy as np

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from x264_tpu import param_default_preset
    from x264_tpu.encoder import inter, intra
    from x264_tpu.encoder.encoder import validate_parameters
    from x264_tpu.encoder.frame_encode import build_qp_maps
    from x264_tpu.ops import mc
    from x264_tpu.ops.tables import chroma_qp
    from x264_tpu.params import ANALYSE_I4x4, ANALYSE_PSUB16x16

    W, H = 1920, 1088
    mbw, mbh = W // 16, H // 16
    qp = 26
    p = param_default_preset("medium")
    p.width, p.height = W, H
    p.cabac = False
    p.bframe = 0
    p.rc.rc_method = 0
    p.rc.qp_constant = qp
    p = validate_parameters(p)

    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.uint8))
    u = jnp.asarray(rng.integers(0, 256, (H // 2, W // 2)).astype(np.uint8))
    v = jnp.asarray(rng.integers(0, 256, (H // 2, W // 2)).astype(np.uint8))
    ry = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.uint8))
    y_pad = mc.pad_plane(ry)
    hpel = mc.hpel_planes(y_pad)
    cuv = jnp.stack([mc.pad_plane(u, mc.CPAD), mc.pad_plane(v, mc.CPAD)])
    qp_mb = jnp.full((mbh, mbw), qp, jnp.int32)
    qpc_mb = jnp.asarray(chroma_qp(np.full((mbh, mbw), qp), 0), jnp.int32)
    lam = max(1, int(round(2.0 ** ((qp - 12) / 6.0))))
    cap_words = (mbw * mbh * intra.cap_bytes_per_mb(qp)) // 4
    me_range = min(p.analyse.me_range, mc.PAD - 8)

    kw = dict(mbw=mbw, mbh=mbh, cap_words=cap_words,
              me_range=me_range, decimate=p.analyse.dct_decimate,
              deblock=p.deblocking_filter,
              a_off=p.deblocking_filter_alphac0 * 2,
              b_off=p.deblocking_filter_beta * 2,
              cqpo=p.analyse.chroma_qp_offset,
              me_seeded=p.analyse.me_method <= 2,
              partitions=bool(p.analyse.inter & ANALYSE_PSUB16x16),
              i4=bool(p.analyse.intra & ANALYSE_I4x4))

    def timed(name, fn, n=3):
        t0 = time.time()
        r = fn()
        jax.block_until_ready(r)
        tc = time.time() - t0
        t0 = time.time()
        for _ in range(n):
            r = fn()
        jax.block_until_ready(r)
        tr = (time.time() - t0) / n
        print(f"{name:34s} compile+first {tc:7.1f}s   steady "
              f"{tr * 1e3:8.1f} ms", flush=True)

    timed("I program (i4)", lambda: intra.encode_iframe_device(
        y, u, v, qp_mb, qpc_mb, qp, use_pallas=False, **{
            k: kw[k] for k in ("mbw", "mbh", "cap_words", "deblock",
                               "a_off", "b_off", "cqpo", "i4")}))

    wp128 = jnp.asarray(128, jnp.int32)
    wp0 = jnp.asarray(0, jnp.int32)
    timed("P program 1-ref", lambda: inter.encode_pframe_device(
        y, u, v, y_pad, hpel, cuv, qp_mb, qpc_mb, qp, lam,
        wp_w=wp128, wp_o=wp0, **kw))
    timed("P program 2-ref", lambda: inter.encode_pframe_device(
        y, u, v, y_pad, hpel, cuv, qp_mb, qpc_mb, qp, lam,
        ref1_y_pad=y_pad, ref1_hpel=hpel, ref1_cuv_pad=cuv,
        two_refs=True, wp_w=wp128, wp_o=wp0, **kw))

    hp = jax.jit(lambda r: mc.hpel_planes(mc.pad_plane(r)))
    timed("hpel+pad (DPB prep)", lambda: hp(ry))


if __name__ == "__main__":
    main()
