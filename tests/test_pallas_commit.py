"""Golden test: the Pallas wavefront-commit kernel (ops/pallas/commit.py)
must be bit-exact vs the XLA scan (intra._commit_scan) — the checkasm
discipline (SURVEY §4.1) applied to the first Pallas kernel.

Runs the kernel in interpreter mode so it validates on any backend."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp  # noqa: E402

from x264_tpu.encoder.intra import _commit_scan, decide_modes  # noqa: E402
from x264_tpu.ops.pallas.commit import commit_i16_pallas  # noqa: E402


def _content(w, h, seed):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 256, (h, w)).astype(np.uint8)
    u = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    v = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    return y, u, v


@pytest.mark.parametrize("seed", [0, 7])
def test_pallas_commit_matches_xla_scan(seed):
    w, h = 48, 32                    # mbw=3, mbh=2, D=4
    mbw, mbh = w // 16, h // 16
    y, u, v = _content(w, h, seed)
    rng = np.random.default_rng(100 + seed)
    qp_mb = rng.integers(12, 44, (mbh, mbw)).astype(np.int32)
    from x264_tpu.ops.tables import chroma_qp
    qpc_mb = np.asarray(chroma_qp(qp_mb), np.int32)
    i16_mode, chroma_mode, _ = decide_modes(jnp.asarray(y), jnp.asarray(u),
                                            jnp.asarray(v))
    ref_coeffs, ref_recon = _commit_scan(
        jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
        i16_mode, chroma_mode, jnp.asarray(qp_mb), jnp.asarray(qpc_mb),
        mbw, mbh)
    got_coeffs, got_recon = commit_i16_pallas(
        y, u, v, np.asarray(i16_mode), np.asarray(chroma_mode),
        qp_mb, qpc_mb, mbw=mbw, mbh=mbh, interpret=True)
    for k in ("dc", "ac", "udc", "uac", "vdc", "vac"):
        np.testing.assert_array_equal(
            np.asarray(got_coeffs[k]),
            np.asarray(ref_coeffs[k]).reshape(np.asarray(got_coeffs[k])
                                              .shape), err_msg=k)
    for i in range(3):
        np.testing.assert_array_equal(np.asarray(got_recon[i]),
                                      np.asarray(ref_recon[i]),
                                      err_msg=f"plane {i}")


@pytest.mark.parametrize("mixed", [False, True])
def test_pallas_commit_i4_matches(mixed):
    """I_4x4 z-scan lanes (the default-preset path) vs the XLA scan."""
    w, h = 64, 48                    # mbw=4, mbh=3
    mbw, mbh = w // 16, h // 16
    y, u, v = _content(w, h, 11)
    rng = np.random.default_rng(12)
    qp_mb = rng.integers(14, 42, (mbh, mbw)).astype(np.int32)
    from x264_tpu.ops.tables import chroma_qp
    qpc_mb = np.asarray(chroma_qp(qp_mb), np.int32)
    from x264_tpu.encoder.intra import decide_modes_i4
    i16_mode, chroma_mode, _ = decide_modes(jnp.asarray(y), jnp.asarray(u),
                                            jnp.asarray(v))
    i4_modes, _ = decide_modes_i4(jnp.asarray(y))
    i4_mask = rng.integers(0, 2, (mbh, mbw)).astype(bool)
    kw = {}
    if mixed:
        yi, ui, vi = _content(w, h, 13)
        is_intra = rng.integers(0, 2, (mbh, mbw)).astype(bool) | i4_mask
        kw = dict(is_intra=jnp.asarray(is_intra),
                  inter_planes=[jnp.asarray(p) for p in (yi, ui, vi)])
    ref_coeffs, ref_recon = _commit_scan(
        jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
        i16_mode, chroma_mode, jnp.asarray(qp_mb), jnp.asarray(qpc_mb),
        mbw, mbh, i4_mask=jnp.asarray(i4_mask), i4_modes=i4_modes, **kw)
    if mixed:
        kw = dict(is_intra=np.asarray(kw["is_intra"]),
                  inter_planes=(yi, ui, vi))
    got_coeffs, got_recon = commit_i16_pallas(
        y, u, v, np.asarray(i16_mode), np.asarray(chroma_mode),
        qp_mb, qpc_mb, mbw=mbw, mbh=mbh,
        i4_mask=np.asarray(i4_mask), i4_modes=np.asarray(i4_modes),
        interpret=True, **kw)
    for k in ("dc", "ac", "udc", "uac", "vdc", "vac"):
        np.testing.assert_array_equal(
            np.asarray(got_coeffs[k]),
            np.asarray(ref_coeffs[k]).reshape(np.asarray(got_coeffs[k])
                                              .shape), err_msg=k)
    for i in range(3):
        np.testing.assert_array_equal(np.asarray(got_recon[i]),
                                      np.asarray(ref_recon[i]),
                                      err_msg=f"plane {i}")


def test_pallas_commit_mixed_matches():
    """Mixed intra/inter lanes (the intra-in-P path)."""
    w, h = 48, 32
    mbw, mbh = w // 16, h // 16
    y, u, v = _content(w, h, 3)
    yi, ui, vi = _content(w, h, 4)   # fake inter recon
    rng = np.random.default_rng(5)
    is_intra = rng.integers(0, 2, (mbh, mbw)).astype(bool)
    qp_mb = np.full((mbh, mbw), 28, np.int32)
    from x264_tpu.ops.tables import chroma_qp
    qpc_mb = np.asarray(chroma_qp(qp_mb), np.int32)
    i16_mode, chroma_mode, _ = decide_modes(jnp.asarray(y), jnp.asarray(u),
                                            jnp.asarray(v))
    ref_coeffs, ref_recon = _commit_scan(
        jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
        i16_mode, chroma_mode, jnp.asarray(qp_mb), jnp.asarray(qpc_mb),
        mbw, mbh, is_intra=jnp.asarray(is_intra),
        inter_planes=[jnp.asarray(p) for p in (yi, ui, vi)])
    got_coeffs, got_recon = commit_i16_pallas(
        y, u, v, np.asarray(i16_mode), np.asarray(chroma_mode),
        qp_mb, qpc_mb, mbw=mbw, mbh=mbh, is_intra=is_intra,
        inter_planes=(yi, ui, vi), interpret=True)
    for k in ("dc", "ac", "udc", "uac", "vdc", "vac"):
        np.testing.assert_array_equal(
            np.asarray(got_coeffs[k]),
            np.asarray(ref_coeffs[k]).reshape(np.asarray(got_coeffs[k])
                                              .shape), err_msg=k)
    for i in range(3):
        np.testing.assert_array_equal(np.asarray(got_recon[i]),
                                      np.asarray(ref_recon[i]),
                                      err_msg=f"plane {i}")
