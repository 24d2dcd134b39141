"""Pallas commit kernel: TPU smoke + benchmark vs the XLA scan twin.

Usage: python tools/pallas_smoke.py [WxH] [iters]
Validates bit-exactness on the current default backend, then times
intra._commit_scan (XLA lax.scan) against ops.pallas.commit_i16_pallas
at the given frame size (default 1920x1080).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    size = sys.argv[1] if len(sys.argv) > 1 else "1920x1080"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    W, H = map(int, size.split("x"))
    W, H = -(-W // 16) * 16, -(-H // 16) * 16   # mb-align like the encoder
    mbw, mbh = W // 16, H // 16

    from x264_tpu.encoder.intra import _commit_scan
    from x264_tpu.ops.pallas.commit import commit_i16_pallas
    from x264_tpu.ops.tables import chroma_qp

    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.integers(0, 256, (H, W), dtype=np.uint8))
    u = jnp.asarray(rng.integers(0, 256, (H // 2, W // 2), dtype=np.uint8))
    v = jnp.asarray(rng.integers(0, 256, (H // 2, W // 2), dtype=np.uint8))
    i16 = jnp.asarray(rng.integers(0, 4, (mbh, mbw), dtype=np.int32))
    cm = jnp.asarray(rng.integers(0, 4, (mbh, mbw), dtype=np.int32))
    qp = jnp.full((mbh, mbw), 26, jnp.int32)
    qpc = jnp.asarray(np.asarray(chroma_qp(np.full((mbh, mbw), 26))),
                      jnp.int32)

    print(f"backend={jax.default_backend()} size={W}x{H} "
          f"mb={mbw}x{mbh}")

    xla = jax.jit(lambda *a: _commit_scan(*a, mbw, mbh))
    pal = jax.jit(lambda *a: commit_i16_pallas(*a, mbw=mbw, mbh=mbh))

    t0 = time.time()
    cx, rx = jax.block_until_ready(xla(y, u, v, i16, cm, qp, qpc))
    print(f"xla compile+run: {time.time() - t0:.2f}s")
    t0 = time.time()
    cp, rp = jax.block_until_ready(pal(y, u, v, i16, cm, qp, qpc))
    print(f"pallas compile+run: {time.time() - t0:.2f}s")

    ok = all(np.array_equal(np.asarray(cx[k]), np.asarray(cp[k]))
             for k in cx) and \
        all(np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(rx, rp))
    print(f"bit-exact: {ok}")

    for name, fn in (("xla", xla), ("pallas", pal)):
        jax.block_until_ready(fn(y, u, v, i16, cm, qp, qpc))
        t0 = time.time()
        for _ in range(iters):
            out = fn(y, u, v, i16, cm, qp, qpc)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / iters
        print(f"{name}: {dt * 1e3:.2f} ms/frame "
              f"({1.0 / dt:.1f} fps commit-only)")


if __name__ == "__main__":
    main()
