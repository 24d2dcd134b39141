"""Raw TPU capability check: MXU flops, HBM BW, elementwise int32, dispatch
latency, scan-step overhead."""
import time

import jax
import jax.numpy as jnp
import numpy as np


def t(fn, n=10):
    r = fn()
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    return (time.time() - t0) / n


def main():
    print(jax.devices())
    # MXU: bf16 matmul 4096^3
    a = jnp.ones((4096, 4096), jnp.bfloat16)
    b = jnp.ones((4096, 4096), jnp.bfloat16)
    mm = jax.jit(lambda a, b: a @ b)
    dt = t(lambda: mm(a, b))
    print(f"matmul 4096^3 bf16: {dt*1e3:.2f} ms -> "
          f"{2*4096**3/dt/1e12:.1f} TFLOP/s")

    # HBM BW: copy 256MB
    x = jnp.ones((64, 1024, 1024), jnp.float32)
    cp = jax.jit(lambda x: x * 2.0)
    dt = t(lambda: cp(x))
    print(f"elementwise f32 256MB: {dt*1e3:.2f} ms -> "
          f"{2*x.nbytes/dt/1e9:.0f} GB/s")

    # int32 elementwise on 2MP frame x 625 (ESA-like traffic)
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
        return out
    dt = t(lambda: esa_like(f, g), n=3)
    print(f"esa-like 625 shifted SADs: {dt*1e3:.2f} ms")

    # dispatch latency: tiny jit
    tiny = jax.jit(lambda x: x + 1)
    y = jnp.zeros((8, 128), jnp.float32)
    dt = t(lambda: tiny(y), n=50)
    print(f"tiny dispatch: {dt*1e6:.0f} us")

    # scan overhead: 187 trivial steps over a 2MP carry
    @jax.jit
    def scanny(f):
        def step(c, _):
            return c + 1, None
        out, _ = jax.lax.scan(step, f, None, length=187)
        return out
    dt = t(lambda: scanny(f), n=5)
    print(f"187-step trivial scan on 2MP carry: {dt*1e3:.2f} ms "
          f"({dt/187*1e6:.0f} us/step)")

    # scan with dynamic_update_slice on carry (deblock-like)
    @jax.jit
    def scanny2(f):
        def step(c, d):
            s = jax.lax.dynamic_slice(c, (0, d * 8), (1088, 32))
            c = jax.lax.dynamic_update_slice(c, s + 1, (0, d * 8))
            return c, None
        out, _ = jax.lax.scan(step, f, jnp.arange(187))
        return out
    dt = t(lambda: scanny2(f), n=5)
    print(f"187-step dyn-slice scan on 2MP carry: {dt*1e3:.2f} ms "
          f"({dt/187*1e6:.0f} us/step)")

    # gather cost: [N,24,24] window gather from [4,Hp,Wp] (qpel refine-like)
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

    # scatter cost (commit-like): 68-lane MB scatter into 2MP
    rows = (jnp.arange(68) * 16)[:, None, None] + jnp.arange(16)[None, :, None]
    cols = (jnp.arange(68) * 16)[:, None, None] + jnp.arange(16)[None, None, :]
    val = jnp.ones((68, 16, 16), jnp.int32)

    @jax.jit
    def scat(f):
        return f.at[rows, cols].set(val, mode="drop")
    dt = t(lambda: scat(f), n=10)
    print(f"single 68-MB scatter into 2MP: {dt*1e3:.2f} ms")


if __name__ == "__main__":
    main()
