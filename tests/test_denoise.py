"""denoise_dct noise reduction (reference common/quant.c:304 +
x264_noise_reduction_update macroblock.c:1146)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp  # noqa: E402

from x264_tpu.ops import quant  # noqa: E402


def test_denoise_matches_reference_semantics():
    rng = np.random.default_rng(0)
    w = rng.integers(-50, 51, (7, 16, 4, 4)).astype(np.int32)
    off = rng.integers(0, 6, (4, 4)).astype(np.int32)
    got, sums = quant.denoise_dct(jnp.asarray(w), jnp.asarray(off))
    # scalar reference (quant.c:304)
    exp = np.zeros_like(w)
    esums = np.zeros((4, 4), np.int64)
    for idx in np.ndindex(w.shape[:-2]):
        for i in range(4):
            for j in range(4):
                level = int(w[idx][i, j])
                sign = -1 if level < 0 else 1
                a = abs(level)
                esums[i, j] += a
                a -= off[i, j]
                exp[idx][i, j] = 0 if a < 0 else sign * a
    np.testing.assert_array_equal(np.asarray(got), exp)
    np.testing.assert_array_equal(np.asarray(sums), esums)


def test_nr_update_learns_offsets():
    s = np.zeros((4, 4), np.int64)
    c = 0
    sums = np.full((4, 4), 20000, np.int64)
    off, s2, c2 = quant.nr_update(1000, sums, 400, s, c)
    assert off[0, 0] == 0                      # DC never denoised
    assert (off[1:, :] >= 0).all()
    assert off.max() > 0                       # learned something
    assert c2 == 400 and (s2 == sums).all()
