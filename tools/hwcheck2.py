"""Re-measure with forced d2h sync (np.asarray of a scalar output)."""
import time

import jax
import jax.numpy as jnp
import numpy as np


def t(fn, n=10):
    np.asarray(fn())  # warm + sync
    t0 = time.time()
    for _ in range(n):
        r = fn()
    v = np.asarray(r)  # forces full queue drain
    return (time.time() - t0) / n


def main():
    a = jnp.ones((4096, 4096), jnp.bfloat16)
    b = jnp.ones((4096, 4096), jnp.bfloat16)
    mm = jax.jit(lambda a, b: (a @ b).sum())
    dt = t(lambda: mm(a, b))
    print(f"matmul 4096^3 bf16: {dt*1e3:.2f} ms -> "
          f"{2*4096**3/dt/1e12:.1f} TFLOP/s")

    x = jnp.ones((64, 1024, 1024), jnp.float32)
    cp = jax.jit(lambda x: (x * 2.0).sum())
    dt = t(lambda: cp(x))
    print(f"elementwise f32 256MB: {dt*1e3:.2f} ms -> "
          f"{x.nbytes/dt/1e9:.0f} GB/s read")

    f = jnp.ones((1088, 1920), jnp.int32)
    g = jnp.ones((1088 + 64, 1920 + 64), jnp.int32)

    @jax.jit
    def esa_like(f, g):
        def step(c, k):
            s = jax.lax.dynamic_slice(g, (32, 32), f.shape)
            sad = jnp.abs(s - f).reshape(68, 16, 120, 16).sum(axis=(1, 3))
            return jnp.minimum(c, sad + k), None
        init = jnp.full((68, 120), 1 << 30, jnp.int32)
        out, _ = jax.lax.scan(step, init, jnp.arange(625))
        return out.sum()
    dt = t(lambda: esa_like(f, g), n=3)
    print(f"esa-like 625 shifted SADs: {dt*1e3:.2f} ms")

    tiny = jax.jit(lambda x: x + 1)
    y = jnp.zeros((8, 128), jnp.float32)
    dt = t(lambda: np.asarray(tiny(y))[0, 0], n=30)
    print(f"tiny dispatch+sync roundtrip: {dt*1e6:.0f} us")

    @jax.jit
    def scanny2(f):
        def step(c, d):
            s = jax.lax.dynamic_slice(c, (0, d * 8), (1088, 32))
            c = jax.lax.dynamic_update_slice(c, s + 1, (0, d * 8))
            return c, None
        out, _ = jax.lax.scan(step, f, jnp.arange(187))
        return out.sum()
    dt = t(lambda: scanny2(f), n=5)
    print(f"187-step dyn-slice scan on 2MP carry: {dt*1e3:.2f} ms "
          f"({dt/187*1e6:.1f} us/step)")

    hp = jnp.ones((4, 1152, 1984), jnp.uint8)
    bx = jnp.arange(8160, dtype=jnp.int32) % 1900
    by = jnp.arange(8160, dtype=jnp.int32) % 1100
    ar = jnp.arange(24, dtype=jnp.int32)

    @jax.jit
    def gat(hp, bx, by):
        rows = jnp.clip(by[:, None, None] + ar[None, :, None], 0, 1151)
        cols = jnp.clip(bx[:, None, None] + ar[None, None, :], 0, 1983)
        return hp[:, rows, cols].astype(jnp.int32).sum()
    dt = t(lambda: gat(hp, bx, by), n=3)
    print(f"window gather 4x8160x24x24: {dt*1e3:.2f} ms")

    @jax.jit
    def gat1(hp, bx, by):
        ar16 = jnp.arange(16, dtype=jnp.int32)
        rows = jnp.clip(by[:, None, None] + ar16[None, :, None], 0, 1151)
        cols = jnp.clip(bx[:, None, None] + ar16[None, None, :], 0, 1983)
        return hp[0][rows, cols].astype(jnp.int32).sum()
    dt = t(lambda: gat1(hp, bx, by), n=3)
    print(f"MC-like gather 8160x16x16 one plane: {dt*1e3:.2f} ms")

    rows = (jnp.arange(68) * 16)[:, None, None] + jnp.arange(16)[None, :, None]
    cols = (jnp.arange(68) * 16)[:, None, None] + jnp.arange(16)[None, None, :]
    val = jnp.ones((68, 16, 16), jnp.int32)

    @jax.jit
    def scat(f):
        return f.at[rows, cols].set(val, mode="drop").sum()
    dt = t(lambda: scat(f), n=10)
    print(f"single 68-MB scatter into 2MP: {dt*1e3:.2f} ms")

    # 187-step scan each with one 68-MB scatter (commit-like)
    @jax.jit
    def scan_scatter(f):
        def step(c, d):
            c = c.at[rows, cols + d].set(val, mode="drop")
            return c, None
        out, _ = jax.lax.scan(step, f, jnp.arange(187))
        return out.sum()
    dt = t(lambda: scan_scatter(f), n=3)
    print(f"187-step scatter scan: {dt*1e3:.2f} ms ({dt/187*1e6:.1f} us/step)")


if __name__ == "__main__":
    main()
