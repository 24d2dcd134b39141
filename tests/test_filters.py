"""Video filter chain tests (reference filters/video/*)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from x264_tpu import params as P  # noqa: E402
from x264_tpu.io.filters import build_chain  # noqa: E402
from x264_tpu.io.y4m import VideoInfo  # noqa: E402


class FakeReader:
    def __init__(self, n=6, w=64, h=48, depth=8):
        dt = np.uint8 if depth == 8 else np.uint16
        hi = 256 if depth == 8 else 1024
        rng = np.random.default_rng(0)
        self.frames = [
            [rng.integers(0, hi, (h, w)).astype(dt),
             rng.integers(0, hi, (h // 2, w // 2)).astype(dt),
             rng.integers(0, hi, (h // 2, w // 2)).astype(dt)]
            for _ in range(n)]
        self.info = VideoInfo(w, h, 30, 1, csp=P.CSP_I420,
                              bitdepth=depth, num_frames=n)
        self.closed = False

    def __iter__(self):
        return iter(self.frames)

    def close(self):
        self.closed = True


def test_crop():
    r = FakeReader()
    ch = build_chain(r, "crop:8,4,16,12")
    assert (ch.info.width, ch.info.height) == (64 - 24, 48 - 16)
    frames = list(ch)
    assert frames[0][0].shape == (32, 40)
    assert frames[0][1].shape == (16, 20)
    np.testing.assert_array_equal(frames[0][0],
                                  r.frames[0][0][4:36, 8:48])
    np.testing.assert_array_equal(frames[0][1],
                                  r.frames[0][1][2:18, 4:24])


def test_crop_chroma_alignment():
    r = FakeReader()
    ch = build_chain(r, "crop:1,1,0,0")   # rounded down to 0,0
    assert (ch.info.width, ch.info.height) == (64, 48)


def test_select_every():
    r = FakeReader(n=6)
    ch = build_chain(r, "select_every:2,0")
    out = list(ch)
    assert len(out) == 3
    np.testing.assert_array_equal(out[1][0], r.frames[2][0])
    assert ch.info.fps_num * 2 * 1 == 30 * 1 * ch.info.fps_den
    assert ch.info.num_frames == 3


def test_select_every_multi_offset():
    r = FakeReader(n=6)
    out = list(build_chain(r, "select_every:3,0,2"))
    assert len(out) == 4
    np.testing.assert_array_equal(out[1][0], r.frames[2][0])
    np.testing.assert_array_equal(out[2][0], r.frames[3][0])


def test_resize():
    r = FakeReader()
    ch = build_chain(r, "resize:width=32,height=24")
    out = list(ch)
    assert out[0][0].shape == (24, 32)
    assert out[0][1].shape == (12, 16)
    # constant image stays constant through bilinear
    r2 = FakeReader(n=1)
    r2.frames[0] = [np.full((48, 64), 77, np.uint8),
                    np.full((24, 32), 100, np.uint8),
                    np.full((24, 32), 200, np.uint8)]
    out2 = list(build_chain(r2, "resize:width=32,height=24"))
    assert np.all(out2[0][0] == 77)


def test_depth_auto_insert():
    r = FakeReader(depth=10)
    ch = build_chain(r, None)
    assert ch.info.bitdepth == 8
    out = list(ch)
    assert out[0][0].dtype == np.uint8
    # dithered round of v/4: always within 1 of the float value
    ref = r.frames[0][0].astype(np.float32) / 4.0
    assert np.max(np.abs(out[0][0].astype(np.float32) - ref)) <= 1.0


def test_depth_upconvert():
    # direct filter use: build_chain would auto-insert a 10->8 converter
    # after it to match the 8-bit encoder (reference behavior)
    from x264_tpu.io.filters import DepthFilter, SourceFilter
    r = FakeReader(depth=8)
    ch = DepthFilter(SourceFilter(r), 10)
    out = list(ch)
    assert out[0][0].dtype == np.uint16
    np.testing.assert_array_equal(
        out[0][0], r.frames[0][0].astype(np.uint16) << 2)


def test_chain_order_and_close():
    r = FakeReader()
    ch = build_chain(r, "crop:0,0,32,24/resize:width=64,height=48")
    out = list(ch)
    assert out[0][0].shape == (48, 64)
    ch.close()
    assert r.closed


def test_unknown_filter():
    r = FakeReader()
    try:
        build_chain(r, "nope:1")
    except ValueError as e:
        assert "nope" in str(e)
    else:
        raise AssertionError("expected ValueError")


def test_threaded_reader():
    from x264_tpu.io.thread_input import ThreadedReader
    r = FakeReader(n=8)
    tr = ThreadedReader(r, depth=2)
    out = list(tr)
    assert len(out) == 8
    for a, b in zip(out, r.frames):
        np.testing.assert_array_equal(a[0], b[0])
    tr.close()
    assert r.closed


def test_threaded_reader_error_propagates():
    from x264_tpu.io.thread_input import ThreadedReader

    class Boom(FakeReader):
        def __iter__(self):
            yield self.frames[0]
            raise RuntimeError("disk on fire")

    tr = ThreadedReader(Boom(n=2), depth=2)
    it = iter(tr)
    next(it)
    try:
        next(it)
    except RuntimeError as e:
        assert "disk on fire" in str(e)
    else:
        raise AssertionError("expected RuntimeError")
