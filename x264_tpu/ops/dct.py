"""Integer transforms: 4x4/8x8 core DCT, DC Hadamards, zig-zag scans.

Reference op table: common/dct.h:29-77 (x264_dct_function_t / zigzag), C
impls common/dct.c. Here each op is a JAX function batched over arbitrary
leading dims ([..., 4, 4] / [..., 8, 8]) so a whole frame's blocks transform
in one fused device pass; `*_np` twins are the checkasm-style reference
implementations (pure numpy, validated against the JAX versions in
tests/test_ops_dct.py).

All math follows H.264 spec 8.5.10-8.5.13; forward transforms are the
standard JM/x264 companions of the spec inverses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import tables

# forward 4x4 core matrix
_CF = np.array([[1, 1, 1, 1],
                [2, 1, -1, -2],
                [1, -1, -1, 1],
                [1, -2, 2, -1]], dtype=np.int32)


# --------------------------------------------------------------------- 4x4
@jax.jit
def dct4x4(x):
    """Forward 4x4 core transform, batched [..., 4, 4] int32."""
    cf = jnp.asarray(_CF)
    return jnp.einsum("ij,...jk,lk->...il", cf, x.astype(jnp.int32), cf,
                      preferred_element_type=jnp.int32)


@jax.jit
def idct4x4(d):
    """Inverse 4x4 core transform on dequantized coeffs (spec 8.5.12.2).

    Output residual = (core + 32) >> 6, batched [..., 4, 4]."""
    d = d.astype(jnp.int32)

    def rows(a):
        a0, a1, a2, a3 = a[..., 0, :], a[..., 1, :], a[..., 2, :], a[..., 3, :]
        e0 = a0 + a2
        e1 = a0 - a2
        e2 = (a1 >> 1) - a3
        e3 = a1 + (a3 >> 1)
        return jnp.stack([e0 + e3, e1 + e2, e1 - e2, e0 - e3], axis=-2)

    h = rows(d)
    v = rows(h.swapaxes(-1, -2)).swapaxes(-1, -2)
    return (v + 32) >> 6


@jax.jit
def sub_dct4x4(fenc, fdec):
    """DCT of fenc - fdec (reference sub4x4_dct)."""
    return dct4x4(fenc.astype(jnp.int32) - fdec.astype(jnp.int32))


def add_idct4x4(pred, coefs_dequant, bitdepth: int = 8):
    """pred + idct, clipped to pixel range (reference add4x4_idct)."""
    r = idct4x4(coefs_dequant)
    return jnp.clip(pred.astype(jnp.int32) + r, 0, (1 << bitdepth) - 1)


# ---------------------------------------------------------------- hadamard
@jax.jit
def hadamard4x4(x):
    """4x4 Hadamard (for I16x16 luma DC; reference dct4x4dc). No scaling."""
    h = jnp.asarray(np.array([[1, 1, 1, 1],
                              [1, 1, -1, -1],
                              [1, -1, -1, 1],
                              [1, -1, 1, -1]], dtype=np.int32))
    return jnp.einsum("ij,...jk,lk->...il", h, x.astype(jnp.int32), h,
                      preferred_element_type=jnp.int32)


def ihadamard4x4(x):
    """Inverse 4x4 Hadamard == forward (scaling handled by DC dequant)."""
    return hadamard4x4(x)


@jax.jit
def dct4x4dc(x):
    """Forward luma-DC transform: 4x4 Hadamard with >>1 normalization
    (reference dct4x4dc, common/dct.c — the encoder-side companion of the
    spec's unscaled inverse + dequant chain)."""
    return hadamard4x4(x) >> 1


@jax.jit
def hadamard2x2(x):
    """2x2 chroma-DC hadamard: [[a+b+c+d, a-b+c-d],[a+b-c-d, a-b-c+d]]."""
    x = x.astype(jnp.int32)
    a, b = x[..., 0, 0], x[..., 0, 1]
    c, d = x[..., 1, 0], x[..., 1, 1]
    return jnp.stack([
        jnp.stack([a + b + c + d, a - b + c - d], axis=-1),
        jnp.stack([a + b - c - d, a - b - c + d], axis=-1)], axis=-2)


ihadamard2x2 = hadamard2x2


# --------------------------------------------------------------------- 8x8
def _fdct8_1d(a):
    """Forward 8-point stage on last axis (x264/JM companion transform)."""
    s = [a[..., i] for i in range(8)]
    b0 = s[0] + s[7]
    b1 = s[1] + s[6]
    b2 = s[2] + s[5]
    b3 = s[3] + s[4]
    b4 = s[0] - s[7]
    b5 = s[1] - s[6]
    b6 = s[2] - s[5]
    b7 = s[3] - s[4]
    c0 = b0 + b3
    c1 = b1 + b2
    c2 = b0 - b3
    c3 = b1 - b2
    c4 = b5 + b6 + ((b4 >> 1) + b4)
    c5 = b4 - b7 - ((b6 >> 1) + b6)
    c6 = b4 + b7 - ((b5 >> 1) + b5)
    c7 = b5 - b6 + ((b7 >> 1) + b7)
    return jnp.stack([
        c0 + c1,
        c4 + (c7 >> 2),
        c2 + (c3 >> 1),
        c5 + (c6 >> 2),
        c0 - c1,
        c6 - (c5 >> 2),
        (c2 >> 1) - c3,
        (c4 >> 2) - c7,
    ], axis=-1)


@jax.jit
def dct8x8(x):
    """Forward 8x8 transform, batched [..., 8, 8]."""
    x = x.astype(jnp.int32)
    h = _fdct8_1d(x)                       # along rows' last axis (columns)
    v = _fdct8_1d(h.swapaxes(-1, -2)).swapaxes(-1, -2)
    return v


def _idct8_1d(a):
    """Inverse 8-point stage (spec 8.5.13.2) on last axis."""
    s = [a[..., i] for i in range(8)]
    e0 = s[0] + s[4]
    e2 = s[0] - s[4]
    e4 = (s[2] >> 1) - s[6]
    e6 = s[2] + (s[6] >> 1)
    f0 = e0 + e6
    f2 = e2 + e4
    f4 = e2 - e4
    f6 = e0 - e6
    e1 = -s[3] + s[5] - s[7] - (s[7] >> 1)
    e3 = s[1] + s[7] - s[3] - (s[3] >> 1)
    e5 = -s[1] + s[7] + s[5] + (s[5] >> 1)
    e7 = s[3] + s[5] + s[1] + (s[1] >> 1)
    f1 = e1 + (e7 >> 2)
    f7 = e7 - (e1 >> 2)
    f3 = e3 + (e5 >> 2)
    f5 = (e3 >> 2) - e5
    return jnp.stack([
        f0 + f7, f2 + f5, f4 + f3, f6 + f1,
        f6 - f1, f4 - f3, f2 - f5, f0 - f7,
    ], axis=-1)


@jax.jit
def idct8x8(d):
    """Inverse 8x8 on dequantized coeffs; output = (core + 32) >> 6."""
    d = d.astype(jnp.int32)
    h = _idct8_1d(d)
    v = _idct8_1d(h.swapaxes(-1, -2)).swapaxes(-1, -2)
    return (v + 32) >> 6


def add_idct8x8(pred, coefs_dequant, bitdepth: int = 8):
    r = idct8x8(coefs_dequant)
    return jnp.clip(pred.astype(jnp.int32) + r, 0, (1 << bitdepth) - 1)


# ------------------------------------------------------------------- scans
def zigzag4(blocks):
    """Scan [..., 4, 4] -> [..., 16] in zig-zag order."""
    flat = blocks.reshape(blocks.shape[:-2] + (16,))
    return flat[..., jnp.asarray(tables.ZIGZAG4_FRAME)]


def izigzag4(scans):
    inv = np.argsort(tables.ZIGZAG4_FRAME)
    flat = scans[..., jnp.asarray(inv)]
    return flat.reshape(scans.shape[:-1] + (4, 4))


def zigzag8(blocks):
    flat = blocks.reshape(blocks.shape[:-2] + (64,))
    return flat[..., jnp.asarray(tables.ZIGZAG8_FRAME)]


def izigzag8(scans):
    inv = np.argsort(tables.ZIGZAG8_FRAME)
    flat = scans[..., jnp.asarray(inv)]
    return flat.reshape(scans.shape[:-1] + (8, 8))


def zigzag8_to_4x4_cavlc(scan64):
    """Split an 8x8 zig-zag scan into 4 interleaved 16-coeff runs for CAVLC
    (spec: 8x8 blocks are coded as 4 4x4 in CAVLC; reference
    zigzag_interleave_8x8_cavlc, dct.h:69)."""
    return scan64[..., 0::4], scan64[..., 1::4], scan64[..., 2::4], \
        scan64[..., 3::4]


# ------------------------------------------ numpy reference implementations
def dct4x4_np(x):
    x = np.asarray(x, dtype=np.int64)
    return np.einsum("ij,...jk,lk->...il", _CF, x, _CF).astype(np.int32)


def idct4x4_np(d):
    d = np.asarray(d, dtype=np.int64)

    def rows(a):
        out = np.empty_like(a)
        a0, a1, a2, a3 = a[..., 0, :], a[..., 1, :], a[..., 2, :], a[..., 3, :]
        e0, e1 = a0 + a2, a0 - a2
        e2 = (a1 >> 1) - a3
        e3 = a1 + (a3 >> 1)
        out[..., 0, :] = e0 + e3
        out[..., 1, :] = e1 + e2
        out[..., 2, :] = e1 - e2
        out[..., 3, :] = e0 - e3
        return out

    h = rows(d)
    v = rows(h.swapaxes(-1, -2)).swapaxes(-1, -2)
    return ((v + 32) >> 6).astype(np.int32)


def hadamard4x4_np(x):
    h = np.array([[1, 1, 1, 1], [1, 1, -1, -1],
                  [1, -1, -1, 1], [1, -1, 1, -1]], dtype=np.int64)
    return np.einsum("ij,...jk,lk->...il", h, np.asarray(x, np.int64),
                     h).astype(np.int32)


def dct8x8_np(x):
    import numpy as _np

    def f1d(a):
        a = a.astype(_np.int64)
        s = [a[..., i] for i in range(8)]
        b0, b1 = s[0] + s[7], s[1] + s[6]
        b2, b3 = s[2] + s[5], s[3] + s[4]
        b4, b5 = s[0] - s[7], s[1] - s[6]
        b6, b7 = s[2] - s[5], s[3] - s[4]
        c0, c1, c2, c3 = b0 + b3, b1 + b2, b0 - b3, b1 - b2
        c4 = b5 + b6 + ((b4 >> 1) + b4)
        c5 = b4 - b7 - ((b6 >> 1) + b6)
        c6 = b4 + b7 - ((b5 >> 1) + b5)
        c7 = b5 - b6 + ((b7 >> 1) + b7)
        return _np.stack([c0 + c1, c4 + (c7 >> 2), c2 + (c3 >> 1),
                          c5 + (c6 >> 2), c0 - c1, c6 - (c5 >> 2),
                          (c2 >> 1) - c3, (c4 >> 2) - c7], axis=-1)

    h = f1d(np.asarray(x))
    return f1d(h.swapaxes(-1, -2)).swapaxes(-1, -2).astype(np.int32)


def idct8x8_np(d):
    import numpy as _np

    def i1d(a):
        a = a.astype(_np.int64)
        s = [a[..., i] for i in range(8)]
        e0, e2 = s[0] + s[4], s[0] - s[4]
        e4 = (s[2] >> 1) - s[6]
        e6 = s[2] + (s[6] >> 1)
        f0, f2, f4, f6 = e0 + e6, e2 + e4, e2 - e4, e0 - e6
        e1 = -s[3] + s[5] - s[7] - (s[7] >> 1)
        e3 = s[1] + s[7] - s[3] - (s[3] >> 1)
        e5 = -s[1] + s[7] + s[5] + (s[5] >> 1)
        e7 = s[3] + s[5] + s[1] + (s[1] >> 1)
        f1, f7 = e1 + (e7 >> 2), e7 - (e1 >> 2)
        f3, f5 = e3 + (e5 >> 2), (e3 >> 2) - e5
        return _np.stack([f0 + f7, f2 + f5, f4 + f3, f6 + f1,
                          f6 - f1, f4 - f3, f2 - f5, f0 - f7], axis=-1)

    h = i1d(np.asarray(d))
    v = i1d(h.swapaxes(-1, -2)).swapaxes(-1, -2)
    return ((v + 32) >> 6).astype(np.int32)
