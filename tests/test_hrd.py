"""HRD model tests (host-only): the CPB simulator in tools/hrd_check.py
against synthetic streams built from our own SPS/SEI writers, plus the
rate-control hrd_fullness math (reference ratecontrol.c:2194)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.hrd_check import check_hrd
from x264_tpu import params as P
from x264_tpu.entropy import nal as nal_mod
from x264_tpu.entropy import sets


def _hrd_params(cbr=False, kbps=1000, fps=25):
    p = P.param_default_preset("medium", None)
    p.width, p.height = 64, 48
    p.fps_num, p.fps_den = fps, 1
    p.rc.vbv_max_bitrate = kbps
    p.rc.vbv_buffer_size = kbps          # 1s buffer
    p.rc.bitrate = kbps
    p.rc.rc_method = P.RC_ABR
    p.nal_hrd = P.NAL_HRD_CBR if cbr else P.NAL_HRD_VBR
    return p


def _build_stream(p, au_bytes, bp_delay=None, bp_offset=0):
    """Annex-B stream: SPS+PPS then AUs of the given slice sizes with
    BP SEI on AU0 and PT SEI on every AU (2 ticks/frame)."""
    sps = sets.sps_init(p)
    pps = sets.pps_init(p, sps)
    if bp_delay is None:
        # full buffer at start
        bp_delay = 90000 * sps.hrd_cpb_size_unscaled \
            // sps.hrd_bitrate_unscaled
    nals = [nal_mod.nal_encode(nal_mod.NAL_SPS, 3, sets.sps_write(sps)),
            nal_mod.nal_encode(nal_mod.NAL_PPS, 3, sets.pps_write(pps))]
    out = bytearray(nal_mod.annexb_bytes(nals))
    for i, size in enumerate(au_bytes):
        seis = []
        if i == 0:
            seis.append(nal_mod.nal_encode(
                nal_mod.NAL_SEI, 0,
                sets.sei_buffering_period(sps, bp_delay, bp_offset)))
        seis.append(nal_mod.nal_encode(
            nal_mod.NAL_SEI, 0, sets.sei_pic_timing(sps, 2 * i, 0)))
        slice_nal = nal_mod.NAL(
            1 if i else 5, 3, bytes([0x65 if i == 0 else 0x41])
            + b"\xaa" * size)
        out += nal_mod.annexb_bytes(seis + [slice_nal])
    return bytes(out)


class TestCheckHrd:
    def test_conformant_vbr(self):
        p = _hrd_params(cbr=False, kbps=1000, fps=25)
        # 1000 kb/s / 25 fps = 5000 bytes/frame; stay well under
        data = _build_stream(p, [3000] * 10)
        rep = check_hrd(data)
        assert rep["ok"] is True, rep
        assert rep["n_au"] == 10

    def test_underflow_detected(self):
        p = _hrd_params(cbr=False, kbps=1000, fps=25)
        # one AU far larger than the whole CPB (125000 bytes) cannot
        # arrive in time no matter the schedule
        data = _build_stream(p, [3000, 200_000, 3000])
        rep = check_hrd(data)
        assert rep["ok"] is False
        assert rep["underflows"] >= 1

    def test_cbr_overflow_detected(self):
        p = _hrd_params(cbr=True, kbps=1000, fps=25)
        # CBR arrival never pauses: tiny AUs overfill the buffer
        data = _build_stream(p, [10] * 60)
        rep = check_hrd(data)
        assert rep["cbr"] is True
        assert rep["overflows"] >= 1

    def test_no_hrd_stream(self):
        p = _hrd_params()
        p.rc.vbv_max_bitrate = 0
        p.rc.vbv_buffer_size = 0
        p.nal_hrd = P.NAL_HRD_NONE
        sps = sets.sps_init(p)
        pps = sets.pps_init(p, sps)
        data = nal_mod.annexb_bytes([
            nal_mod.nal_encode(nal_mod.NAL_SPS, 3, sets.sps_write(sps)),
            nal_mod.nal_encode(nal_mod.NAL_PPS, 3, sets.pps_write(pps)),
            nal_mod.NAL(5, 3, b"\x65" + b"\xaa" * 100)])
        rep = check_hrd(data)
        assert rep["ok"] is None


class TestHrdFullness:
    def test_delay_matches_fill(self):
        from x264_tpu.encoder.ratecontrol import RateControl
        p = _hrd_params(cbr=False, kbps=1000, fps=25)
        rc = RateControl(p)
        sps = sets.sps_init(p)
        rate, cpb = sps.hrd_bitrate_unscaled, sps.hrd_cpb_size_unscaled
        d, off = rc.hrd_fullness(rate, cpb)
        # vbv_buffer_init default fills the buffer fraction; delay+offset
        # always spans the whole buffer drain time
        total = 90000 * cpb // rate
        assert abs((d + off) - total) <= 2
        assert 0 <= d <= total

    def test_fill_tracks_consumption(self):
        from x264_tpu.encoder.encoder import TYPE_P
        from x264_tpu.encoder.ratecontrol import RateControl
        p = _hrd_params(cbr=False, kbps=1000, fps=25)
        p.rc.vbv_buffer_init = 1.0
        rc = RateControl(p)
        sps = sets.sps_init(p)
        rate, cpb = sps.hrd_bitrate_unscaled, sps.hrd_cpb_size_unscaled
        d0, _ = rc.hrd_fullness(rate, cpb)
        # consume a big frame: fill drops, so the advertised delay drops
        rc.end(TYPE_P, bits=400_000, satd_cost=1e6, qp_used=30)
        d1, _ = rc.hrd_fullness(rate, cpb)
        assert d1 < d0

    def test_cbr_filler(self):
        from x264_tpu.encoder.encoder import TYPE_P
        from x264_tpu.encoder.ratecontrol import RateControl
        p = _hrd_params(cbr=True, kbps=1000, fps=25)
        p.rc.vbv_buffer_init = 1.0
        rc = RateControl(p)
        # tiny frame: buffer would overflow; filler must absorb it
        rc.end(TYPE_P, bits=100, satd_cost=1e6, qp_used=30)
        fb = rc.hrd_filler_bits()
        assert fb > 0
        assert rc.buffer_fill <= rc.buffer_size + 8
        # vbr never fills
        p2 = _hrd_params(cbr=False, kbps=1000, fps=25)
        p2.rc.vbv_buffer_init = 1.0
        rc2 = RateControl(p2)
        rc2.end(TYPE_P, bits=100, satd_cost=1e6, qp_used=30)
        assert rc2.hrd_filler_bits() == 0
