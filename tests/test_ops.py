"""checkasm-equivalent: JAX ops vs independent numpy/spec reference impls on
random vectors (reference: tools/checkasm.c methodology)."""

import numpy as np
import pytest

from x264_tpu.ops import dct, pixel, predict, quant, tables


@pytest.fixture
def blocks4(rng):
    return rng.integers(-255, 256, (64, 4, 4)).astype(np.int32)


@pytest.fixture
def blocks8(rng):
    return rng.integers(-255, 256, (32, 8, 8)).astype(np.int32)


# ------------------------------------------------------------------- dct ---
def test_dct4_matches_ref(blocks4):
    np.testing.assert_array_equal(np.asarray(dct.dct4x4(blocks4)),
                                  dct.dct4x4_np(blocks4))


def test_idct4_matches_ref(rng):
    coefs = rng.integers(-2000, 2000, (64, 4, 4)).astype(np.int32)
    np.testing.assert_array_equal(np.asarray(dct.idct4x4(coefs)),
                                  dct.idct4x4_np(coefs))


def test_dct8_matches_ref(blocks8):
    np.testing.assert_array_equal(np.asarray(dct.dct8x8(blocks8)),
                                  dct.dct8x8_np(blocks8))


def test_idct8_matches_ref(rng):
    coefs = rng.integers(-2000, 2000, (32, 8, 8)).astype(np.int32)
    np.testing.assert_array_equal(np.asarray(dct.idct8x8(coefs)),
                                  dct.idct8x8_np(coefs))


def test_hadamard_roundtrip(blocks4):
    h = dct.hadamard4x4(blocks4)
    back = dct.ihadamard4x4(h)
    np.testing.assert_array_equal(np.asarray(back) // 16, blocks4)


def test_zigzag_roundtrip(blocks4, rng):
    z = dct.zigzag4(blocks4)
    np.testing.assert_array_equal(np.asarray(dct.izigzag4(z)), blocks4)
    b8 = rng.integers(-100, 100, (8, 8, 8)).astype(np.int32)
    z8 = dct.zigzag8(b8)
    np.testing.assert_array_equal(np.asarray(dct.izigzag8(z8)), b8)


def test_zigzag_order_spec():
    # the 4x4 zig-zag must visit raster indices in the spec order
    want = [0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15]
    assert tables.ZIGZAG4_FRAME.tolist() == want


@pytest.mark.parametrize("qp", [0, 5, 12, 23, 35, 44, 51])
def test_quantdequant_roundtrip_4x4(qp, rng):
    """dct->quant->dequant->idct must reconstruct residual within the
    H.264 design error bound."""
    res = rng.integers(-64, 64, (32, 4, 4)).astype(np.int32)
    w = dct.dct4x4(res)
    lv = quant.quant4x4(w, qp, intra=True)
    dq = quant.dequant4x4(lv, qp)
    rec = dct.idct4x4(dq)
    err = np.abs(np.asarray(rec) - res).max()
    # error grows with qstep: ~ 0.63 * 2^(qp/6)
    bound = max(2, int(1.3 * 2 ** (qp / 6)))
    assert err <= bound, (qp, err, bound)


@pytest.mark.parametrize("qp", [0, 17, 29, 38, 51])
def test_quant_dequant_match_ref(qp, blocks4, blocks8):
    w4 = dct.dct4x4_np(blocks4)
    np.testing.assert_array_equal(np.asarray(quant.quant4x4(w4, qp, True)),
                                  quant.quant4x4_np(w4, qp, True))
    lv = quant.quant4x4_np(w4, qp, True)
    np.testing.assert_array_equal(np.asarray(quant.dequant4x4(lv, qp)),
                                  quant.dequant4x4_np(lv, qp))
    w8 = dct.dct8x8_np(blocks8)
    np.testing.assert_array_equal(np.asarray(quant.quant8x8(w8, qp, False)),
                                  quant.quant8x8_np(w8, qp, False))
    lv8 = quant.quant8x8_np(w8, qp, False)
    np.testing.assert_array_equal(np.asarray(quant.dequant8x8(lv8, qp)),
                                  quant.dequant8x8_np(lv8, qp))


@pytest.mark.parametrize("qp", [0, 10, 24, 36, 40, 51])
def test_dc_dequant_match_ref(qp, rng):
    f = rng.integers(-3000, 3000, (16, 4, 4)).astype(np.int32)
    np.testing.assert_array_equal(np.asarray(quant.dequant4x4_dc(f, qp)),
                                  quant.dequant4x4_dc_np(f, qp))
    f2 = rng.integers(-3000, 3000, (16, 2, 2)).astype(np.int32)
    np.testing.assert_array_equal(np.asarray(quant.dequant2x2_dc(f2, qp)),
                                  quant.dequant2x2_dc_np(f2, qp))


def test_per_block_qp_array(rng):
    """quant must accept per-block qp arrays (adaptive quantization)."""
    res = rng.integers(-64, 64, (8, 4, 4)).astype(np.int32)
    w = dct.dct4x4_np(res)
    qps = rng.integers(10, 40, (8,))
    lv = np.asarray(quant.quant4x4(w, qps, True))
    for i in range(8):
        np.testing.assert_array_equal(
            lv[i], quant.quant4x4_np(w[i], int(qps[i]), True))


def test_chroma_qp_table():
    assert tables.chroma_qp(20) == 20
    assert tables.chroma_qp(30) == 29
    assert tables.chroma_qp(51) == 39
    assert tables.chroma_qp(40) == 36


# ----------------------------------------------------------------- pixel ---
def test_sad_ssd_satd(rng):
    a = rng.integers(0, 256, (16, 16, 16)).astype(np.uint8)
    b = rng.integers(0, 256, (16, 16, 16)).astype(np.uint8)
    np.testing.assert_array_equal(np.asarray(pixel.sad(a, b)),
                                  pixel.sad_np(a, b))
    np.testing.assert_array_equal(np.asarray(pixel.ssd(a, b)),
                                  pixel.ssd_np(a, b))
    np.testing.assert_array_equal(np.asarray(pixel.satd(a, b)),
                                  pixel.satd_np(a, b))


def test_satd_zero_for_identical(rng):
    a = rng.integers(0, 256, (4, 8, 8)).astype(np.uint8)
    assert np.all(np.asarray(pixel.satd(a, a)) == 0)
    assert np.all(np.asarray(pixel.sad(a, a)) == 0)


# --------------------------------------------------------------- predict ---
def _rand_edges(rng, n):
    left = rng.integers(0, 256, (n, 4)).astype(np.int32)
    top = rng.integers(0, 256, (n, 8)).astype(np.int32)
    tl = rng.integers(0, 256, (n,)).astype(np.int32)
    return left, top, tl


@pytest.mark.parametrize("mode", range(9))
def test_predict4x4_vs_spec(mode, rng):
    left, top, tl = _rand_edges(rng, 32)
    allp = np.asarray(predict.predict_4x4_all(
        left, top, tl,
        np.ones(32, bool), np.ones(32, bool)))
    for i in range(32):
        want = predict.predict_4x4_np(mode, left[i], top[i], tl[i])
        np.testing.assert_array_equal(allp[i, mode], want,
                                      err_msg=f"mode {mode} block {i}")


def test_predict4x4_dc_availability(rng):
    left, top, tl = _rand_edges(rng, 8)
    at = np.array([True, True, False, False] * 2)
    al = np.array([True, False, True, False] * 2)
    allp = np.asarray(predict.predict_4x4_all(left, top, tl, al, at))
    for i in range(8):
        if at[i] and al[i]:
            want = (top[i, :4].sum() + left[i].sum() + 4) >> 3
        elif at[i]:
            want = (top[i, :4].sum() + 2) >> 2
        elif al[i]:
            want = (left[i].sum() + 2) >> 2
        else:
            want = 128
        assert np.all(allp[i, predict.I_PRED_4x4_DC] == want)


def test_predict16x16_plane_vs_spec(rng):
    left = rng.integers(0, 256, (8, 16)).astype(np.int32)
    top = rng.integers(0, 256, (8, 16)).astype(np.int32)
    tl = rng.integers(0, 256, (8,)).astype(np.int32)
    allp = np.asarray(predict.predict_16x16_all(
        left, top, tl, np.ones(8, bool), np.ones(8, bool)))
    for i in range(8):
        want = predict.predict_16x16_plane_np(left[i], top[i], tl[i])
        np.testing.assert_array_equal(allp[i, predict.I_PRED_16x16_P], want)
        np.testing.assert_array_equal(allp[i, predict.I_PRED_16x16_V],
                                      np.tile(top[i], (16, 1)))
        np.testing.assert_array_equal(allp[i, predict.I_PRED_16x16_H],
                                      np.tile(left[i][:, None], (1, 16)))


def test_predict_chroma_vs_spec(rng):
    left = rng.integers(0, 256, (8, 8)).astype(np.int32)
    top = rng.integers(0, 256, (8, 8)).astype(np.int32)
    tl = rng.integers(0, 256, (8,)).astype(np.int32)
    allp = np.asarray(predict.predict_chroma_all(
        left, top, tl, np.ones(8, bool), np.ones(8, bool)))
    for i in range(8):
        want = predict.predict_chroma_plane_np(left[i], top[i], tl[i])
        np.testing.assert_array_equal(allp[i, predict.I_PRED_CHROMA_P], want)
        # DC quadrants, both available
        q00 = (top[i, :4].sum() + left[i, :4].sum() + 4) >> 3
        q01 = (top[i, 4:].sum() + 2) >> 2
        q10 = (left[i, 4:].sum() + 2) >> 2
        q11 = (top[i, 4:].sum() + left[i, 4:].sum() + 4) >> 3
        dc = allp[i, predict.I_PRED_CHROMA_DC]
        assert np.all(dc[:4, :4] == q00) and np.all(dc[:4, 4:] == q01)
        assert np.all(dc[4:, :4] == q10) and np.all(dc[4:, 4:] == q11)
