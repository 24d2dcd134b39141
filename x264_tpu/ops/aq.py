"""Adaptive quantization (reference x264_adaptive_quant_frame,
ratecontrol.c:304, aq-mode 1 variance)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def aq_offsets(y, u, v, strength):
    """Per-MB qp offsets from block energies (AQ_VARIANCE).

    energy = var(luma 16x16) + var(chroma 8x8 each);
    qp_offset = strength * (log2(energy) - 14.427)."""
    mbh, mbw = y.shape[0] // 16, y.shape[1] // 16

    def mb_var(plane, s):
        t = plane.reshape(mbh, s, mbw, s).swapaxes(1, 2).astype(jnp.int32)
        su = jnp.sum(t, axis=(2, 3))
        sq = jnp.sum(t * t, axis=(2, 3))
        return sq - (su * su) // (s * s)

    energy = mb_var(y, 16) + mb_var(u, 8) + mb_var(v, 8)
    qp_adj = strength * (jnp.log2(jnp.maximum(energy, 1).astype(jnp.float32))
                         - 14.427)
    return qp_adj


@jax.jit
def qp_maps(y, u, v, frame_qp, strength, qp_min, qp_max, chroma_qp_offset):
    """Per-MB (qp, qp_chroma) maps with variance AQ applied."""
    from .tables import CHROMA_QP_TABLE
    adj = aq_offsets(y, u, v, strength)
    qp = jnp.clip(jnp.round(frame_qp + adj).astype(jnp.int32),
                  qp_min, qp_max)
    qp = jnp.clip(qp, 0, 51)
    cq = jnp.asarray(CHROMA_QP_TABLE)[
        jnp.clip(qp + chroma_qp_offset, 0, 51)]
    return qp, cq
