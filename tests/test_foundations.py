"""Tests for params, bit writer, NAL escaping, SPS/PPS, y4m I/O."""

import io

import numpy as np
import pytest

from x264_tpu import params as P
from x264_tpu.entropy import bits, nal, sets
from x264_tpu.io import y4m


# ---------------------------------------------------------------- params ---

def test_defaults_match_reference():
    p = P.param_default()
    assert p.frame_reference == 3
    assert p.keyint_max == 250
    assert p.bframe == 3
    assert p.rc.rc_method == P.RC_CRF
    assert p.rc.rf_constant == 23
    assert p.analyse.me_method == P.ME_HEX
    assert p.analyse.subpel_refine == 7
    assert p.cabac and p.deblocking_filter
    assert p.rc.mb_tree and p.rc.lookahead == 40


@pytest.mark.parametrize("preset", P.PRESET_NAMES)
def test_presets_apply(preset):
    p = P.param_default_preset(preset)
    if preset == "ultrafast":
        assert not p.cabac and p.bframe == 0 and p.analyse.subpel_refine == 0
    if preset == "placebo":
        assert p.analyse.me_method == P.ME_TESA
        assert p.bframe == 16 and p.frame_reference == 16


def test_preset_numeric_alias():
    assert P.param_default_preset("0").cabac is False  # ultrafast
    assert P.param_default_preset("5").analyse.subpel_refine == 7  # medium


def test_tunes():
    p = P.param_default_preset("medium", "film")
    assert p.analyse.psy_trellis == pytest.approx(0.15)
    p = P.param_default_preset("medium", "zerolatency")
    assert p.bframe == 0 and p.rc.lookahead == 0 and p.sliced_threads
    p = P.param_default_preset("medium", "grain,fastdecode")
    assert not p.cabac and p.rc.qcompress == pytest.approx(0.8)


def test_param_parse():
    p = P.param_default()
    P.param_parse(p, "qp", "30")
    assert p.rc.rc_method == P.RC_CQP and p.rc.qp_constant == 30
    P.param_parse(p, "me", "umh")
    assert p.analyse.me_method == P.ME_UMH
    P.param_parse(p, "no-cabac")
    assert not p.cabac
    P.param_parse(p, "deblock", "-1:-2")
    assert p.deblocking_filter_alphac0 == -1
    assert p.deblocking_filter_beta == -2
    P.param_parse(p, "keyint", "infinite")
    assert p.keyint_max == 1 << 30
    with pytest.raises(P.ParamError):
        P.param_parse(p, "not-a-real-option", "1")
    with pytest.raises(P.ParamError):
        P.param_parse(p, "me", "warp9")


def test_profile_restrictions():
    p = P.param_default()
    P.param_apply_profile(p, "baseline")
    assert not p.cabac and p.bframe == 0 and not p.analyse.transform_8x8
    p = P.param_default()
    p.bitdepth = 10
    with pytest.raises(P.ParamError):
        P.param_apply_profile(p, "high")


# ------------------------------------------------------------------ bits ---

def test_bitwriter_basic():
    bw = bits.BitWriter()
    bw.write(8, 0xAB)
    bw.write(4, 0xC)
    bw.write(4, 0xD)
    assert bw.getvalue() == b"\xab\xcd"


def test_ue_se_golomb():
    # spec examples: ue(0)=1, ue(1)=010, ue(2)=011, ue(3)=00100
    bw = bits.BitWriter()
    for v in (0, 1, 2, 3):
        bw.write_ue(v)
    bw.byte_align_zero()
    # 1 010 011 00100 -> 1010 0110 0100 0000
    assert bw.getvalue() == b"\xa6\x40"
    # se: 0->1, 1->010, -1->011, 2->00100, -2->00101
    bw = bits.BitWriter()
    for v in (0, 1, -1):
        bw.write_se(v)
    bw.byte_align_zero()
    assert bw.getvalue() == b"\xa6"


def test_vectorized_packer_matches_scalar():
    rng = np.random.default_rng(0)
    vals = rng.integers(0, 10_000, size=1000)
    codes, lens = bits.ue_code(vals)
    packed, total = bits.pack_codes(codes, lens)
    bw = bits.BitWriter()
    for v in vals:
        bw.write_ue(int(v))
    bw.byte_align_zero()
    scalar = bw.getvalue()
    assert total == int(lens.sum())
    assert packed[: len(scalar)] == scalar


def test_append_packed_with_offset():
    bw = bits.BitWriter()
    bw.write(3, 0b101)  # unaligned start
    codes, lens = bits.ue_code(np.array([5, 0, 7, 123]))
    bw.append_packed(codes, lens)
    bw.rbsp_trailing()
    ref = bits.BitWriter()
    ref.write(3, 0b101)
    for v in (5, 0, 7, 123):
        ref.write_ue(v)
    ref.rbsp_trailing()
    assert bw.getvalue() == ref.getvalue()


# ------------------------------------------------------------------- nal ---

def test_escape_roundtrip():
    rng = np.random.default_rng(1)
    for _ in range(20):
        raw = rng.integers(0, 4, size=200).astype(np.uint8).tobytes()
        esc = nal.escape_rbsp(raw)
        assert b"\x00\x00\x00" not in esc
        assert b"\x00\x00\x01" not in esc
        assert b"\x00\x00\x02" not in esc
        assert nal.unescape_rbsp(esc) == raw


def test_escape_specific():
    assert nal.escape_rbsp(b"\x00\x00\x00") == b"\x00\x00\x03\x00"
    assert nal.escape_rbsp(b"\x00\x00\x01") == b"\x00\x00\x03\x01"
    assert nal.escape_rbsp(b"\x00\x00\x04") == b"\x00\x00\x04"
    assert nal.escape_rbsp(b"\x00\x00\x00\x00\x00") == \
        b"\x00\x00\x03\x00\x00\x03\x00"


def test_annexb_split():
    n1 = nal.nal_encode(nal.NAL_SPS, 3, b"\x10\x20")
    n2 = nal.nal_encode(nal.NAL_PPS, 3, b"\x30", long_startcode=False)
    stream = nal.annexb_bytes([n1, n2])
    parts = nal.split_annexb(stream)
    assert len(parts) == 2
    assert parts[0] == n1.payload
    assert parts[1] == n2.payload


# --------------------------------------------------------------- sps/pps ---

def test_sps_pps_write_smoke():
    p = P.param_default_preset("medium")
    p.width, p.height = 1280, 720
    p.fps_num, p.fps_den = 30, 1
    sps = sets.sps_init(p)
    assert sps.profile_idc == P.PROFILE_HIGH
    assert sps.mb_width == 80 and sps.mb_height == 45
    raw = sets.sps_write(sps)
    assert len(raw) > 8
    pps = sets.pps_init(p, sps)
    raw_pps = sets.pps_write(pps)
    assert len(raw_pps) >= 2


def test_sps_crop():
    p = P.param_default_preset("ultrafast")
    p.width, p.height = 1920, 1080   # 1080 -> 68 MBs -> crop 8 bottom
    sps = sets.sps_init(p)
    assert sps.mb_height == 68
    assert sps.crop == (0, 0, 0, 8)
    assert sps.profile_idc == P.PROFILE_BASELINE  # uf: no cabac/bframes/8x8
    sets.sps_write(sps)


# ------------------------------------------------------------------- y4m ---

def test_y4m_roundtrip(tmp_path):
    rng = np.random.default_rng(7)
    w, h = 64, 48
    frames = [[rng.integers(0, 256, (h, w), dtype=np.uint8).astype(np.uint8),
               rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8),
               rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)]
              for _ in range(3)]
    path = tmp_path / "t.y4m"
    info = y4m.VideoInfo(w, h, 30, 1)
    wr = y4m.Y4MWriter(path, info)
    for f in frames:
        wr.write_frame(f)
    wr.close()
    rd = y4m.Y4MReader(path)
    assert rd.info.width == w and rd.info.num_frames == 3
    for want in frames:
        got = rd.read_frame()
        for a, b in zip(want, got):
            np.testing.assert_array_equal(a, b)
    assert rd.read_frame() is None
