"""Trellis quantization: the batched Viterbi's bookkeeping is checked
against an INDEPENDENT exact scorer (full adaptive context simulation of
the writer's coding process, native/cabac.cpp block_residual), and its
output must never score worse than the deadzone input."""

import numpy as np
import pytest

from x264_tpu.ops import dct, quant, tables
from x264_tpu.ops import trellis as TR


def exact_score(levels_z, coefs_z, qp, sig_cost, last_cost, lvl_states,
                intra=False):
    """Cost of a GIVEN level assignment, simulating the real writer:
    sig/last flags forward to the last nonzero, abs-level bins in
    reverse with FULL adaptive states for all 10 contexts (the trellis
    only tracks the 4 repeatable ones — for any single path they agree),
    plus transform-domain SSD with the reference's DC-only rounding."""
    ENT, NEXT = TR.ENT, TR.NEXT
    lam2 = float((TR.LAM2_INTRA if intra else TR.LAM2_INTER)[qp])
    unq = TR.UNQ4_ZIG[qp]
    w2 = TR.W2_ZIG4
    lv = np.abs(levels_z)
    c = np.abs(coefs_z).astype(np.float64)
    nz = np.nonzero(lv)[0]
    bits = 0.0
    # SSD (with DC rounding when the block decodes as DC-only)
    dc_only = len(nz) == 0 or (len(nz) == 1 and nz[0] == 0)
    ssd = 0.0
    for i in range(16):
        dq = (int(unq[i]) * int(lv[i]) + 128) >> 8
        if i == 0 and dc_only:
            dq = ((dq + 8) >> 4) << 4
        d = c[i] - dq
        ssd += d * d * w2[i]
    if len(nz) == 0:
        return ssd
    last = int(nz[-1])
    # sig / last flags (position 15 inferred)
    for i in range(last + 1):
        if i == 15:
            break
        if lv[i]:
            bits += sig_cost[i, 1]
            bits += last_cost[i, 1 if i == last else 0]
        else:
            bits += sig_cost[i, 0]
    # abs level bins, reverse order, full adaptive state array
    st = lvl_states.copy().astype(np.int64)
    node = 0
    for i in range(last, -1, -1):
        a = int(lv[i])
        if a == 0:
            continue
        ctx = TR._L1CTX[node]
        gt1 = 1 if a > 1 else 0
        bits += ENT[int(st[ctx]) ^ gt1]
        st[ctx] = NEXT[int(st[ctx]), gt1]
        if a > 1:
            gctx = TR._GT1CTX_LUMA[node]
            m = min(a, 15)
            for _ in range(m - 2):
                bits += ENT[int(st[gctx]) ^ 1]
                st[gctx] = NEXT[int(st[gctx]), 1]
            if a < 15:
                bits += ENT[int(st[gctx]) ^ 0]
                st[gctx] = NEXT[int(st[gctx]), 0]
            else:
                x = a - 15
                bits += 2 * int(np.floor(np.log2(x + 1))) + 1
            node = TR._TN[node]
        else:
            node = TR._T1[node]
        bits += 1.0  # sign bypass
    return ssd + lam2 * bits


def _random_blocks(rng, n, scale):
    """Random residual blocks -> dct -> (coefs, deadzone levels)."""
    res = rng.integers(-scale, scale + 1, size=(n, 4, 4))
    w = np.asarray(dct.dct4x4(res.astype(np.int32)))
    return w


@pytest.mark.parametrize("qp", [18, 26, 34, 42])
def test_trellis_score_matches_exact_scorer(qp):
    rng = np.random.default_rng(qp)
    w = _random_blocks(rng, 64, scale=40)
    lv = quant.quant4x4_np(w.reshape(-1, 4, 4), qp, intra=False)
    lv_z = np.asarray(dct.zigzag4(lv.reshape(-1, 4, 4)))
    w_z = np.asarray(dct.zigzag4(w.reshape(-1, 4, 4)))
    sig, last, lvls = TR.frame_ctx_costs(False, qp, cat=2)
    qpv = np.full(lv_z.shape[0], qp, np.int32)
    out, sc = TR.trellis_4x4(lv_z, w_z, qpv, sig, last, lvls)
    out, sc = np.asarray(out), np.asarray(sc)
    for k in range(out.shape[0]):
        ex = exact_score(out[k], w_z[k], qp, sig, last, lvls)
        assert abs(ex - sc[k]) <= max(2e-3 * abs(ex), 0.05), \
            (k, ex, sc[k], out[k])


@pytest.mark.parametrize("qp", [22, 30, 38])
def test_trellis_never_worse_than_deadzone(qp):
    rng = np.random.default_rng(100 + qp)
    w = _random_blocks(rng, 128, scale=25)
    lv = quant.quant4x4_np(w.reshape(-1, 4, 4), qp, intra=False)
    lv_z = np.asarray(dct.zigzag4(lv.reshape(-1, 4, 4)))
    w_z = np.asarray(dct.zigzag4(w.reshape(-1, 4, 4)))
    sig, last, lvls = TR.frame_ctx_costs(False, qp, cat=2)
    qpv = np.full(lv_z.shape[0], qp, np.int32)
    out, _ = TR.trellis_4x4(lv_z, w_z, qpv, sig, last, lvls)
    out = np.asarray(out)
    better, worse, changed = 0, 0, 0
    for k in range(out.shape[0]):
        e_in = exact_score(lv_z[k], w_z[k], qp, sig, last, lvls)
        e_out = exact_score(out[k], w_z[k], qp, sig, last, lvls)
        if not np.array_equal(out[k], lv_z[k]):
            changed += 1
        if e_out < e_in - 1e-6:
            better += 1
        elif e_out > e_in + 1e-3 * abs(e_in) + 0.05:
            worse += 1
    # the deadzone assignment is itself a path in the trellis, so the
    # winner can never score worse (path merging keeps minima)
    assert worse == 0, (worse, changed)
    assert changed > 0 and better > 0  # it actually optimizes something


def test_trellis_zero_block_passthrough():
    w_z = np.zeros((4, 16), np.int32)
    sig, last, lvls = TR.frame_ctx_costs(False, 30, cat=2)
    out, _ = TR.trellis_4x4(w_z, w_z, np.full(4, 30, np.int32),
                            sig, last, lvls)
    assert np.all(np.asarray(out) == 0)


def test_trellis_levels_bounded_by_deadzone():
    rng = np.random.default_rng(7)
    w = _random_blocks(rng, 64, scale=60)
    qp = 24
    lv = quant.quant4x4_np(w.reshape(-1, 4, 4), qp, intra=False)
    lv_z = np.asarray(dct.zigzag4(lv.reshape(-1, 4, 4)))
    w_z = np.asarray(dct.zigzag4(w.reshape(-1, 4, 4)))
    sig, last, lvls = TR.frame_ctx_costs(False, qp, cat=2)
    out, _ = TR.trellis_4x4(lv_z, w_z, np.full(lv_z.shape[0], qp,
                                               np.int32),
                            sig, last, lvls)
    out = np.asarray(out)
    assert np.all(np.abs(out) <= np.abs(lv_z))
    assert np.all(np.abs(out) >= np.maximum(np.abs(lv_z) - 1, 0) *
                  (out != 0))
