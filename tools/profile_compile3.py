"""Stage-wise XLA compile cost at 1080p bench config + parallel-compile
probe (does the axon remote compiler overlap two compilations?)."""
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from x264_tpu.encoder import inter, intra
    from x264_tpu.ops import mc
    from x264_tpu.ops.tables import chroma_qp

    W, H = 1920, 1088
    mbw, mbh = W // 16, H // 16
    n = mbw * mbh
    qp = 26
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.uint8))
    u = jnp.asarray(rng.integers(0, 256, (H // 2, W // 2)).astype(np.uint8))
    v = jnp.asarray(rng.integers(0, 256, (H // 2, W // 2)).astype(np.uint8))
    ry = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.uint8))
    y_pad = mc.pad_plane(ry)
    hpel = mc.hpel_planes(y_pad)
    qp_mb = jnp.full((mbh, mbw), qp, jnp.int32)
    qpc_mb = jnp.asarray(chroma_qp(np.full((mbh, mbw), qp), 0), jnp.int32)
    lam = 5
    lam_mb = jnp.full((mbh, mbw), lam, jnp.int32)
    me_range = 24
    jax.block_until_ready(hpel)

    def tc(name, thunk):
        t0 = time.time()
        r = thunk()
        jax.block_until_ready(r)
        print(f"{name:42s} first(trace+compile+run) {time.time()-t0:7.1f}s",
              flush=True)
        return r

    i16m, cm, _, i16c = tc("decide_modes_full", lambda:
                           intra.decide_modes_full(y, u, v, lam=lam_mb))
    i4m, i4c = tc("decide_modes_i4", lambda:
                  intra.decide_modes_i4(y, lam=lam_mb))
    i4_mask = i4c < i16c

    tc("commit_i16x16 (xla scan, i16 only)", lambda:
       intra.commit_i16x16(y, u, v, i16m, cm, qp_mb, qpc_mb,
                           mbw=mbw, mbh=mbh))

    com_i4 = jax.jit(lambda: intra._commit_scan(
        y, u, v, i16m, cm, qp_mb, qpc_mb, mbw, mbh,
        i4_mask=i4_mask, i4_modes=i4m))
    coeffs, recon = tc("commit scan + i4 inner", com_i4)

    from x264_tpu.entropy.cavlc_jax import encode_i16x16_frame_dev
    cap_words = n * 450 // 4
    tc("I entropy (CAVLC dev)", lambda: encode_i16x16_frame_dev(
        i16m.reshape(-1), cm.reshape(-1), qp_mb.reshape(-1), qp,
        coeffs["dc"], coeffs["ac"],
        jnp.stack([coeffs["udc"], coeffs["vdc"]], axis=1),
        jnp.stack([coeffs["uac"], coeffs["vac"]], axis=1),
        mbw=mbw, mbh=mbh, cap_words=cap_words,
        is_i4=i4_mask.reshape(-1), i4_modes=i4m.reshape(-1, 16)))

    from x264_tpu.ops.deblock import compute_strengths, deblock_frame
    nnz4 = jnp.zeros((mbh * 4, mbw * 4), jnp.int32)
    mvf = jnp.zeros((mbh, mbw, 2), jnp.int32)
    bs_v, bs_h = compute_strengths(jnp.zeros((mbh, mbw), bool), nnz4, mvf,
                                   mbw=mbw, mbh=mbh)
    tc("deblock_frame", lambda: deblock_frame(
        recon[0], recon[1], recon[2], bs_v, bs_h, qp_mb, mbw=mbw, mbh=mbh))

    mvs = tc("motion_search_seeded+shapes", lambda:
             inter.motion_search_seeded(y_pad, y, lam, me_range,
                                        shapes=True))
    mvp_q, _ = inter.mv_predictors(mvs["16x16"] * 4)
    tc("subpel_refine_all", lambda: inter.subpel_refine_all(
        hpel, y, mvs, lam, me_range, mvp_q=mvp_q.reshape(-1, 2)))

    from x264_tpu.entropy.cavlc_jax import encode_pframe_entropy_dev
    lv = jnp.zeros((n, 16, 4, 4), jnp.int32)
    cdc = jnp.zeros((n, 2, 2, 2), jnp.int32)
    cac = jnp.zeros((n, 2, 4, 4, 4), jnp.int32)
    tc("P entropy (CAVLC dev)", lambda: encode_pframe_entropy_dev(
        jnp.zeros((n,), bool), jnp.zeros((n, 2), jnp.int32),
        jnp.zeros((n,), jnp.int32), jnp.zeros((n,), jnp.int32),
        qp_mb.reshape(-1), qp, lv, cdc, cac,
        mbw=mbw, mbh=mbh, cap_words=cap_words,
        is_intra=jnp.zeros((n,), bool),
        i16_mode=i16m.reshape(-1), chroma_mode=cm.reshape(-1),
        luma_dc=jnp.zeros((n, 4, 4), jnp.int32),
        part_mode=jnp.zeros((n,), jnp.int32),
        mvd2=jnp.zeros((n, 2), jnp.int32),
        is_i4=i4_mask.reshape(-1), i4_modes=i4m.reshape(-1, 16),
        refidx=jnp.zeros((n,), jnp.int32), two_refs=True,
        two_refs_live=jnp.asarray(True)))

    # ---- parallel-compile probe: two DIFFERENT mid-size programs ----
    def prog(k):
        def f(x):
            def step(c, i):
                c = c + jnp.sin(c * (i + k)) * jnp.cos(c)
                return c, c.sum()
            return jax.lax.scan(step, x, jnp.arange(600 + k))[1]
        return jax.jit(f)

    xs = jnp.ones((256, 512), jnp.float32)
    t0 = time.time()
    jax.block_until_ready(prog(1)(xs))
    s1 = time.time() - t0
    t0 = time.time()
    jax.block_until_ready(prog(2)(xs))
    s2 = time.time() - t0
    rs = []
    t0 = time.time()

    def run(k):
        rs.append(prog(k)(xs))
    th = [threading.Thread(target=run, args=(k,)) for k in (3, 4)]
    [t.start() for t in th]
    [t.join() for t in th]
    jax.block_until_ready(rs)
    par = time.time() - t0
    print(f"parallel-compile probe: serial {s1:.1f}+{s2:.1f}s, "
          f"2 threads {par:.1f}s", flush=True)


if __name__ == "__main__":
    main()
