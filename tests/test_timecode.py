"""Timecode (tcfile v1/v2) parsing + VFR muxing (reference
input/timecode.c, x264.c --tcfile-in/--tcfile-out/--timebase).

Host-only: no device work."""

import io
import struct
import sys

import pytest

from x264_tpu.io.timecode import (TimecodeError, TimecodeMap,
                                  TimecodeWriter, correct_fps,
                                  parse_tcfile)


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


class TestCorrectFps:
    def test_ntsc_rates(self):
        from fractions import Fraction
        assert correct_fps(23.976) == Fraction(24000, 1001)
        assert correct_fps(29.97) == Fraction(30000, 1001)
        assert correct_fps(59.94) == Fraction(60000, 1001)

    def test_exact_rates(self):
        from fractions import Fraction
        assert correct_fps(25.0) == Fraction(25)
        assert correct_fps(24.0) == Fraction(24)

    def test_invalid(self):
        with pytest.raises(TimecodeError):
            correct_fps(0)


class TestV2:
    def test_basic(self, tmp_path):
        path = _write(tmp_path, "tc.txt",
                      "# timecode format v2\n0\n40\n80\n120\n")
        num, den, ticks, ext = parse_tcfile(path)
        # uniform 40ms -> 25fps; seconds = ticks*num/den
        assert [t * num / den for t in ticks] == [0.0, 0.04, 0.08, 0.12]

    def test_vfr(self, tmp_path):
        path = _write(tmp_path, "tc.txt",
                      "# timecode format v2\n0\n40\n60\n100\n")
        num, den, ticks, ext = parse_tcfile(path)
        secs = [t * num / den for t in ticks]
        assert secs == [0.0, 0.04, 0.06, 0.10]

    def test_non_monotone_rejected(self, tmp_path):
        path = _write(tmp_path, "tc.txt",
                      "# timecode format v2\n0\n40\n30\n")
        with pytest.raises(TimecodeError):
            parse_tcfile(path)

    def test_extrapolation(self, tmp_path):
        path = _write(tmp_path, "tc.txt",
                      "# timecode format v2\n0\n40\n80\n")
        m = TimecodeMap(path)
        d = m.pts(2) - m.pts(1)
        assert m.pts(5) == m.pts(2) + 3 * d
        # negative dts extends backwards at the first interval
        assert m.pts(-1) == m.pts(0) - (m.pts(1) - m.pts(0))


class TestV1:
    def test_ranges(self, tmp_path):
        path = _write(tmp_path, "tc.txt",
                      "# timecode format v1\n"
                      "assume 25\n"
                      "0,3,50\n")
        num, den, ticks, ext = parse_tcfile(path)
        secs = [t * num / den for t in ticks]
        # frames 0..3 at 50fps (20ms), rest at 25fps
        assert secs[:5] == [0.0, 0.02, 0.04, 0.06, 0.08]

    def test_assumed_gap(self, tmp_path):
        path = _write(tmp_path, "tc.txt",
                      "# timecode format v1\n"
                      "Assume 25\n"
                      "2,3,50\n")
        num, den, ticks, ext = parse_tcfile(path)
        secs = [t * num / den for t in ticks]
        assert secs[0] == 0.0
        assert abs(secs[1] - 0.04) < 1e-9          # assumed 25fps
        assert abs(secs[2] - 0.08) < 1e-9
        assert abs(secs[3] - 0.10) < 1e-9          # 50fps range begins

    def test_missing_assume_rejected(self, tmp_path):
        path = _write(tmp_path, "tc.txt",
                      "# timecode format v1\n0,3,50\n")
        with pytest.raises(TimecodeError):
            parse_tcfile(path)


class TestWriter:
    def test_roundtrip(self, tmp_path):
        out = str(tmp_path / "out.txt")
        w = TimecodeWriter(out, 1, 1000)
        for t in (0, 40, 80, 120):
            w.add(t)
        w.close()
        num, den, ticks, ext = parse_tcfile(out)
        secs = [t * num / den for t in ticks]
        assert secs == [0.0, 0.04, 0.08, 0.12]

    def test_sorted_on_close(self, tmp_path):
        # coding order (I P B) must yield a display-order tcfile
        out = str(tmp_path / "out.txt")
        w = TimecodeWriter(out, 1, 1000)
        for t in (0, 80, 40):
            w.add(t)
        w.close()
        _, _, ticks, _ = parse_tcfile(out)
        assert ticks == sorted(ticks)


class TestVFRMux:
    """MP4 stts must carry the per-frame tick deltas under a timebase."""

    def _mk_nals(self):
        from x264_tpu.entropy.nal import NAL, NAL_SLICE_IDR
        return [NAL(type=NAL_SLICE_IDR, ref_idc=3, payload=b"\x65" + b"x" * 9)]

    def test_mp4_vfr_stts(self):
        from x264_tpu.io.mux import MP4Output

        class P:
            width, height = 64, 48
            fps_num, fps_den = 25, 1
            timebase_num, timebase_den = 1, 1000

        buf = io.BytesIO()
        out = MP4Output(buf)
        out.set_param(P())
        from x264_tpu.entropy.nal import NAL, NAL_SPS, NAL_PPS
        out.write_headers([NAL(NAL_SPS, 3, b"\x67" + b"\x00" * 8),
                           NAL(NAL_PPS, 3, b"\x68\x00")])
        for t in (0, 40, 60, 100):      # VFR: 40ms, 20ms, 40ms
            out.write_frame(self._mk_nals(), pts=t, dts=t)
        out.close()
        data = buf.getvalue()
        i = data.index(b"stts")
        cnt = struct.unpack(">I", data[i + 8:i + 12])[0]
        runs = [struct.unpack(">II", data[i + 12 + 8 * k:i + 20 + 8 * k])
                for k in range(cnt)]
        deltas = []
        for c, d in runs:
            deltas += [d] * c
        assert deltas == [40, 20, 40, 40]   # last run repeats final delta

    def test_flv_vfr_timestamps(self):
        from x264_tpu.io.mux import FLVOutput

        class P:
            width, height = 64, 48
            fps_num, fps_den = 25, 1
            timebase_num, timebase_den = 1, 1000

        buf = io.BytesIO()
        out = FLVOutput(buf)
        out.set_param(P())
        from x264_tpu.entropy.nal import NAL, NAL_SPS, NAL_PPS
        out.write_headers([NAL(NAL_SPS, 3, b"\x67" + b"\x00" * 8),
                           NAL(NAL_PPS, 3, b"\x68\x00")])
        for t in (0, 40, 60):
            out.write_frame(self._mk_nals(), pts=t, dts=t)
        out.close()
        data = buf.getvalue()
        # video tags: type 9; collect 3-byte timestamps after the seq hdr
        ts = []
        pos = 13
        while pos + 11 <= len(data):
            ttype = data[pos]
            size = int.from_bytes(data[pos + 1:pos + 4], "big")
            t3 = int.from_bytes(data[pos + 4:pos + 7], "big")
            if ttype == 9:
                ts.append(t3)
            pos += 11 + size + 4
        assert ts[1:] == [0, 40, 60]        # [0] is the AVC seq header


class TestLog:
    def test_levels_and_sink(self):
        from x264_tpu.utils.log import (LOG_DEBUG, LOG_ERROR, LOG_WARNING,
                                        Logger)
        got = []
        lg = Logger(level=LOG_WARNING, sink=lambda lv, m: got.append((lv, m)))
        lg.error("e")
        lg.warning("w")
        lg.info("i")
        lg.debug("d")
        assert got == [(LOG_ERROR, "e"), (LOG_WARNING, "w")]
        lg.level = LOG_DEBUG
        lg.info("i2")
        assert got[-1] == (2, "i2")
