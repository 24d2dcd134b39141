"""Per-frame encode dispatch: analysis/commit on device, entropy on host.

Reference analogue: slices_write/slice_write (encoder.c:3159/2752), but
re-expressed as whole-frame batched passes instead of a per-MB loop.
"""

from __future__ import annotations

import numpy as np

from ..entropy import nal as nal_mod
from ..entropy.slice_hdr import slice_header_write


def dispatch_frame(enc, planes, ftype, qp, ref_tag=None, tree_off=None,
                   pir=None):
    """Returns (finalize_fn, retry_fn(qp)->(finalize, recon), recon_dev,
    ref_tag) — ref_tag is the DPB tag this frame references (None for
    intra), used to re-dispatch against the same reference after an
    overflow re-encode repaired the DPB. tree_off: optional per-MB
    MB-tree qp offsets from the lookahead (ratecontrol.c:541 analogue)."""
    from .encoder import TYPE_IDR, TYPE_I, TYPE_P
    if enc.p.force_pcm:
        if ftype not in (TYPE_IDR, TYPE_I):
            raise NotImplementedError("PCM mode is intra-only")
        nals, recon = encode_frame_pcm(enc, planes, ftype, qp)
        return (lambda: (nals, recon)), None, recon, None
    if ftype in (TYPE_IDR, TYPE_I):
        from . import intra
        return intra.dispatch_iframe(enc, planes, ftype, qp,
                                     tree_off=tree_off)
    if ftype == TYPE_P:
        from . import inter
        return inter.dispatch_pframe(enc, planes, ftype, qp, ref_tag,
                                     tree_off=tree_off, pir=pir)
    raise NotImplementedError("B frames dispatch via bframe.py")


def build_qp_maps(enc, y, u, v, qp_try, tree_off=None):
    """Per-MB (qp, qp_chroma) maps: AQ offsets (+ MB-tree offsets when
    the lookahead provides them), the reference's
    x264_adaptive_quant_frame + macroblock_tree_finish composition."""
    import jax.numpy as jnp

    from ..ops.tables import chroma_qp
    mbh, mbw = enc.mb_h, enc.mb_w
    if enc.p.rc.aq_mode or tree_off is not None:
        from ..ops.aq import aq_offsets
        from ..ops.tables import CHROMA_QP_TABLE
        adj = (aq_offsets(y, u, v, enc.p.rc.aq_strength)
               if enc.p.rc.aq_mode else jnp.zeros((mbh, mbw),
                                                  jnp.float32))
        if tree_off is not None:
            adj = adj + jnp.asarray(tree_off, jnp.float32)
        qp_mb = jnp.clip(jnp.round(qp_try + adj).astype(jnp.int32),
                         enc.p.rc.qp_min, enc.p.rc.qp_max)
        qp_mb = jnp.clip(qp_mb, 0, 51)
        qpc_mb = jnp.asarray(CHROMA_QP_TABLE)[
            jnp.clip(qp_mb + enc.p.analyse.chroma_qp_offset, 0, 51)]
        return qp_mb, qpc_mb.astype(jnp.int32)
    qp_mb = jnp.full((mbh, mbw), qp_try, jnp.int32)
    qpc_mb = jnp.asarray(
        chroma_qp(np.full((mbh, mbw), qp_try),
                  enc.p.analyse.chroma_qp_offset), jnp.int32)
    return qp_mb, qpc_mb


def encode_frame_pcm(enc, planes, ftype, qp):
    """I_PCM frame: raw samples, mb_type 25 (spec 7.3.5 / 8.3.5).

    First-light path that exercises NAL/slice plumbing with trivially
    correct reconstruction (recon == source)."""
    sh = enc._slice_header(ftype, qp)
    bw = slice_header_write(sh, nal_ref_idc=nal_mod.NAL_PRIORITY_HIGHEST)
    y, u, v = planes
    for mby in range(enc.mb_h):
        for mbx in range(enc.mb_w):
            bw.write_ue(25)           # mb_type I_PCM
            bw.byte_align_zero()      # pcm_alignment_zero_bit
            yb = y[mby * 16:(mby + 1) * 16, mbx * 16:(mbx + 1) * 16]
            ub = u[mby * 8:(mby + 1) * 8, mbx * 8:(mbx + 1) * 8]
            vb = v[mby * 8:(mby + 1) * 8, mbx * 8:(mbx + 1) * 8]
            bw.extend_bytes(yb.astype(np.uint8).tobytes())
            bw.extend_bytes(ub.astype(np.uint8).tobytes())
            bw.extend_bytes(vb.astype(np.uint8).tobytes())
    bw.rbsp_trailing()
    from .encoder import TYPE_IDR
    nal_type = (nal_mod.NAL_SLICE_IDR if ftype == TYPE_IDR
                else nal_mod.NAL_SLICE)
    nals = [nal_mod.nal_encode(nal_type, nal_mod.NAL_PRIORITY_HIGHEST,
                               bw.getvalue())]
    recon = [y.copy(), u.copy(), v.copy()]
    return nals, recon
