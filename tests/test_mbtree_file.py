"""MB-tree 2-pass stats file (reference mbtree_fix8_pack/unpack mc.h:338,
x264_macroblock_tree_read ratecontrol.c:541, resolution rescale
ratecontrol.c:417-540). Host-only: exercises the RateControl round-trip."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import x264_tpu.params as P  # noqa: E402
from x264_tpu.encoder.ratecontrol import RateControl  # noqa: E402


def _params(w=64, h=48, stat_out="", stat_in="", stat_read=False):
    p = P.param_default_preset("medium")
    p.width, p.height = w, h
    p.rc.rc_method = P.RC_ABR
    p.rc.bitrate = 300
    p.rc.qp_max = 51
    p.rc.stat_write = bool(stat_out)
    p.rc.stat_out = stat_out
    p.rc.stat_read = stat_read
    p.rc.stat_in = stat_in
    return p


def test_mbtree_file_roundtrip(tmp_path):
    stats = str(tmp_path / "x264.stats")
    p1 = _params(stat_out=stats)
    rc1 = RateControl(p1)
    rng = np.random.default_rng(0)
    offs = {}
    for i in range(4):
        o = rng.normal(0, 1.5, (3, 4)).astype(np.float32)
        offs[i] = o
        rc1.mbtree_record(i, o)
        rc1.start(3)
        rc1.end(3, 9000, 40000.0, 26)   # also produces stat lines
    rc1.write_stats()
    assert os.path.exists(stats + ".mbtree")

    p2 = _params(stat_in=stats, stat_read=True)
    rc2 = RateControl(p2)
    for i in range(4):
        got = rc2.mbtree_fetch(i)
        assert got is not None
        # fix8 quantization: within 1/256 + rounding
        np.testing.assert_allclose(got, offs[i], atol=1.0 / 256 + 1e-6)


def test_mbtree_rescale_on_resolution_change(tmp_path):
    stats = str(tmp_path / "x264.stats")
    p1 = _params(w=64, h=48, stat_out=stats)
    rc1 = RateControl(p1)
    o = np.arange(12, dtype=np.float32).reshape(3, 4) / 4.0
    rc1.mbtree_record(0, o)
    rc1.start(3)
    rc1.end(3, 9000, 40000.0, 26)
    rc1.write_stats()
    # second pass at double resolution: offsets rescale to the new grid
    p2 = _params(w=128, h=96, stat_in=stats, stat_read=True)
    rc2 = RateControl(p2)
    got = rc2.mbtree_fetch(0)
    assert got is not None
    assert got.shape == (6, 8)
    # nearest-neighbor upscale preserves corner values
    assert abs(got[0, 0] - o[0, 0]) <= 1.0 / 256 + 1e-6
    assert abs(got[-1, -1] - o[-1, -1]) <= 1.0 / 256 + 1e-6
