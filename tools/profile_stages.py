"""Micro-profile: motion_search stages, decide_modes, commit, deblock,
entropy — with sync-overhead accounting (tunnel roundtrip ~30ms)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import x264_tpu.encoder.inter as inter
import x264_tpu.encoder.intra as intra
from x264_tpu.encoder import wavefront
from x264_tpu.ops import mc
from x264_tpu.ops.tables import chroma_qp

SYNC = None


def t(fn, n=10):
    np.asarray(jax.tree_util.tree_leaves(fn())[0])
    t0 = time.time()
    for _ in range(n):
        r = fn()
    np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0]
    dt = (time.time() - t0) / n
    if SYNC is not None:
        dt -= SYNC / n
    return dt * 1e3


def main():
    global SYNC
    tiny = jax.jit(lambda x: x + 1)
    yy = jnp.zeros((8, 128), jnp.float32)
    np.asarray(tiny(yy))
    t0 = time.time()
    for _ in range(20):
        np.asarray(tiny(yy))
    SYNC = (time.time() - t0) / 20
    print(f"sync roundtrip: {SYNC*1e3:.1f} ms")

    rng = np.random.default_rng(0)
    H, W = 1088, 1920
    mbh, mbw = H // 16, W // 16
    n = mbh * mbw
    y = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.uint8))
    u = jnp.asarray(rng.integers(0, 256, (H // 2, W // 2)).astype(np.uint8))
    v = jnp.asarray(rng.integers(0, 256, (H // 2, W // 2)).astype(np.uint8))
    ry = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.uint8))
    y_pad = mc.pad_plane(ry)
    hpel = mc.hpel_planes(y_pad)
    lam = 5
    R = 12

    src = y.astype(jnp.int32)
    tiles = intra._mb_tiles(y, 16).reshape(n, 16, 16)

    # stage 1: ESA scan only
    offs = [(dx, dy) for dy in range(-R, R + 1) for dx in range(-R, R + 1)]
    while len(offs) % 8:
        offs.append(offs[-1])
    offsets = np.array(offs, np.int32).reshape(-1, 8, 2)

    @jax.jit
    def esa():
        def step(carry, off8):
            best_cost, best_mv = carry
            for k in range(8):
                dx, dy = off8[k, 0], off8[k, 1]
                shifted = jax.lax.dynamic_slice(
                    y_pad, (mc.PAD + dy, mc.PAD + dx), (H, W)).astype(jnp.int32)
                sad = inter._tile_sad_map(jnp.abs(shifted - src), mbh, mbw)
                cost = sad + lam * (inter._mv_cost_bits(dx * 4)
                                    + inter._mv_cost_bits(dy * 4))
                better = cost < best_cost
                best_cost = jnp.where(better, cost, best_cost)
                new_mv = jnp.stack([jnp.broadcast_to(dx, sad.shape),
                                    jnp.broadcast_to(dy, sad.shape)], axis=-1)
                best_mv = jnp.where(better[..., None], new_mv, best_mv)
            return (best_cost, best_mv), None
        init = (jnp.full((mbh, mbw), 1 << 30, jnp.int32),
                jnp.zeros((mbh, mbw, 2), jnp.int32))
        (cost, mv), _ = jax.lax.scan(step, init, jnp.asarray(offsets))
        return mv
    print(f"ESA full-pel scan ({len(offs)} offsets): {t(esa):8.1f} ms")

    # full motion_search
    ms = jax.jit(lambda: inter.motion_search(y_pad, hpel, y, lam, R))
    print(f"motion_search total:      {t(ms):8.1f} ms")

    # one window gather
    mv_fp = jnp.zeros((n, 2), jnp.int32)
    @jax.jit
    def wingather():
        x0 = (jnp.arange(n, dtype=jnp.int32) % mbw) * 16
        y0 = (jnp.arange(n, dtype=jnp.int32) // mbw) * 16
        bx = x0 + mv_fp[:, 0] + mc.PAD - 2
        by = y0 + mv_fp[:, 1] + mc.PAD - 2
        ar = jnp.arange(24, dtype=jnp.int32)
        Hp, Wp = hpel.shape[1], hpel.shape[2]
        rows = jnp.clip(by[:, None, None] + ar[None, :, None], 0, Hp - 1)
        cols = jnp.clip(bx[:, None, None] + ar[None, None, :], 0, Wp - 1)
        return hpel[:, rows, cols].astype(jnp.int32).sum()
    print(f"one [4,N,24,24] window gather: {t(wingather, 5):8.1f} ms")

    # satd16 of 25 candidates
    win = jnp.zeros((4, n, 24, 24), jnp.int32)
    @jax.jit
    def satd25():
        c = jnp.zeros((n,), jnp.int32)
        for k in range(25):
            c = c + inter._satd16(win[0, :, 2:18, 2:18] + k, tiles)
        return c
    print(f"25x _satd16 [N,16,16]:    {t(satd25, 5):8.1f} ms")

    # luma MC gather
    mvq = jnp.zeros((n, 2), jnp.int32)
    x0 = (jnp.arange(n, dtype=jnp.int32) % mbw) * 16
    y0 = (jnp.arange(n, dtype=jnp.int32) // mbw) * 16
    mcg = jax.jit(lambda: mc.luma_mc_block(hpel, x0, y0, mvq, 16).sum())
    print(f"luma_mc_block gather:     {t(mcg, 5):8.1f} ms")

    upad = mc.pad_plane(u, mc.PAD // 2)
    cmc = jax.jit(lambda: mc.chroma_mc_block(upad, x0 // 2, y0 // 2, mvq, 8).sum())
    print(f"chroma_mc_block gather:   {t(cmc, 5):8.1f} ms")

    # decide_modes
    dm = jax.jit(lambda: intra.decide_modes(y, u, v))
    print(f"decide_modes:             {t(dm, 5):8.1f} ms")

    # commit wavefront
    sx_, sy_, sv_, dg_, ln_ = wavefront.schedule(mbw, mbh)
    sx, sy, sv = jnp.asarray(sx_), jnp.asarray(sy_), jnp.asarray(sv_)
    qp_mb = jnp.full((mbh, mbw), 26, jnp.int32)
    qpc_mb = jnp.asarray(chroma_qp(np.full((mbh, mbw), 26), 0), jnp.int32)
    i16m = jnp.zeros((mbh, mbw), jnp.int32)
    cm = jnp.zeros((mbh, mbw), jnp.int32)
    com = jax.jit(lambda: intra.commit_i16x16(
        y, u, v, i16m, cm, qp_mb, qpc_mb, sx, sy, sv, mbw=mbw, mbh=mbh))
    print(f"commit_i16x16 wavefront:  {t(com, 3):8.1f} ms")

    # deblock wavefront
    from x264_tpu.ops.deblock import compute_strengths, deblock_frame
    nnz4 = jnp.zeros((mbh * 4, mbw * 4), jnp.int32)
    mvf = jnp.zeros((mbh, mbw, 2), jnp.int32)
    bs_v, bs_h = compute_strengths(jnp.zeros((mbh, mbw), bool), nnz4, mvf,
                                   mbw=mbw, mbh=mbh)
    dbf = jax.jit(lambda: deblock_frame(y, u, v, bs_v, bs_h, qp_mb,
                                        sx, sy, sv, mbw=mbw, mbh=mbh))
    print(f"deblock_frame wavefront:  {t(dbf, 3):8.1f} ms")

    # entropy
    from x264_tpu.entropy.cavlc_jax import encode_pframe_entropy_dev
    cap_words = n * 450 // 4
    lv = jnp.zeros((n, 16, 4, 4), jnp.int32)
    cdc = jnp.zeros((n, 2, 2, 2), jnp.int32)
    cac = jnp.zeros((n, 2, 4, 4, 4), jnp.int32)
    ent = jax.jit(lambda: encode_pframe_entropy_dev(
        jnp.zeros((n,), bool), mvq, jnp.zeros((n,), jnp.int32),
        jnp.zeros((n,), jnp.int32), qp_mb.reshape(-1), 26, lv, cdc, cac,
        mbw=mbw, mbh=mbh, cap_words=cap_words))
    print(f"P entropy (zero resid):   {t(ent, 5):8.1f} ms")

    hp = jax.jit(lambda: mc.hpel_planes(mc.pad_plane(y)))
    print(f"hpel_planes+pad:          {t(hp, 5):8.1f} ms")


if __name__ == "__main__" and "--new" not in __import__("sys").argv:
    main()


def main_new():
    """Round-3 additions: seeded vs full ESA, Pallas vs XLA commit,
    sliced-band vmap throughput. Run after main() or standalone."""
    global SYNC
    import x264_tpu.encoder.inter as inter
    import x264_tpu.encoder.intra as intra
    from x264_tpu.ops import mc
    from x264_tpu.ops.tables import chroma_qp
    if SYNC is None:
        tiny = jax.jit(lambda x: x + 1)
        yy = jnp.zeros((8, 128), jnp.float32)
        np.asarray(tiny(yy))
        t0 = time.time()
        for _ in range(20):
            np.asarray(tiny(yy))
        SYNC = (time.time() - t0) / 20
        print(f"sync roundtrip: {SYNC*1e3:.1f} ms")
    rng = np.random.default_rng(0)
    H, W = 1088, 1920
    mbh, mbw = H // 16, W // 16
    y = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.uint8))
    u = jnp.asarray(rng.integers(0, 256, (H // 2, W // 2)).astype(np.uint8))
    v = jnp.asarray(rng.integers(0, 256, (H // 2, W // 2)).astype(np.uint8))
    ry = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.uint8))
    y_pad = mc.pad_plane(ry)
    hpel = mc.hpel_planes(y_pad)

    full = jax.jit(lambda: inter.motion_search(y_pad, hpel, y, 5, 16))
    print(f"motion_search ESA R=16:    {t(full, 3):8.1f} ms")
    seeded = jax.jit(lambda: inter.motion_search_seeded(y_pad, y, 5, 16))
    print(f"motion_search seeded R=16: {t(seeded, 3):8.1f} ms")
    fullp = jax.jit(lambda: inter.motion_search(y_pad, hpel, y, 5, 16,
                                                shapes=True))
    print(f"ESA +partition shapes:     {t(fullp, 3):8.1f} ms")
    seedp = jax.jit(lambda: inter.motion_search_seeded(y_pad, y, 5, 16,
                                                       shapes=True))
    print(f"seeded +partition shapes:  {t(seedp, 3):8.1f} ms")

    qp_mb = jnp.full((mbh, mbw), 26, jnp.int32)
    qpc_mb = jnp.asarray(chroma_qp(np.full((mbh, mbw), 26), 0), jnp.int32)
    i16m, cm, _ = intra.decide_modes(y, u, v)

    xla_commit = jax.jit(lambda: intra.commit_i16x16(
        y, u, v, i16m, cm, qp_mb, qpc_mb, mbw=mbw, mbh=mbh))
    print(f"commit scan (XLA):         {t(xla_commit, 3):8.1f} ms")
    try:
        from x264_tpu.ops.pallas.commit import commit_i16_pallas
        pl_commit = jax.jit(lambda: commit_i16_pallas(
            y, u, v, i16m, cm, qp_mb, qpc_mb, mbw=mbw, mbh=mbh))
        print(f"commit scan (Pallas):      {t(pl_commit, 3):8.1f} ms")
    except Exception as e:  # noqa: BLE001
        print(f"commit scan (Pallas): FAILED {type(e).__name__}: "
              f"{str(e)[:200]}")


if __name__ == "__main__" and "--new" in __import__("sys").argv:
    main_new()
