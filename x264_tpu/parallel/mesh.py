"""Multi-chip sharding: the TPU-native re-expression of the reference's
thread parallelism (SURVEY.md §2.9, doc/threads.txt).

Mapping:
  * mesh axis "stream" — data parallelism over independent frames/streams
    (the encode-farm / frame-threads analogue, dp).
  * mesh axis "band" — spatial parallelism over horizontal slice bands
    within a frame (the sliced-threads analogue, sp/tp). Each band is coded
    as an independent H.264 slice, exactly like x264's sliced threading
    (threaded_slices_write, encoder.c:3219), so no cross-band dependencies
    exist and no halo exchange is needed for intra; deblock-across-slices
    later adds a ppermute halo pass.

All collectives are implicit: shard_map + out_specs keeps every band's
coefficients on its own device until the host entropy gather.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..encoder import wavefront
from ..encoder.intra import encode_iframe_device


def make_mesh(n_devices: int, devices=None) -> Mesh:
    """2D (stream, band) mesh; factorizes n into the two axes."""
    if devices is None:
        devices = jax.devices()[:n_devices]
    band = 1
    for cand in (4, 2):
        if n_devices % cand == 0 and n_devices > cand:
            band = cand
            break
    stream = n_devices // band
    dev_array = np.array(devices).reshape(stream, band)
    return Mesh(dev_array, ("stream", "band"))


def make_sharded_intra_step(mesh: Mesh, width: int, band_mb_rows: int):
    """Build the jitted multi-device intra encode step.

    Input planes are [B, NB, bandH, W] (+ chroma at half size) with
    B sharded over "stream" and NB (number of bands) over "band".
    Returns (step_fn, schedule_arrays).
    """
    mbw = width // 16
    sx, sy, sv, diag_of, lane_of = wavefront.schedule(mbw, band_mb_rows)
    sxj, syj, svj = jnp.asarray(sx), jnp.asarray(sy), jnp.asarray(sv)
    dgj, lnj = jnp.asarray(diag_of), jnp.asarray(lane_of)
    cap_words = mbw * band_mb_rows * 64

    def band_encode(y, u, v, qp, qpc):
        # local shapes: [b, nb, bandH, W]
        def one(y1, u1, v1, q1, qc1):
            return encode_iframe_device(y1, u1, v1, q1, qc1, 26,
                                        sxj, syj, svj, dgj, lnj, mbw=mbw,
                                        mbh=band_mb_rows,
                                        cap_words=cap_words)
        return jax.vmap(jax.vmap(one))(y, u, v, qp, qpc)

    pspec = P("stream", "band")
    step = jax.jit(
        jax.shard_map(
            band_encode, mesh=mesh,
            in_specs=(pspec, pspec, pspec, pspec, pspec),
            out_specs=pspec,
            check_vma=False,   # scan carry starts unvarying (zeros init)
        ))
    return step


def sharded_intra_encode(mesh: Mesh, planes_batch, qp: int = 26,
                         band_mb_rows: int = 2):
    """Encode a batch of frames data+band parallel; returns device outputs.

    planes_batch: list of [Y,U,V] numpy frames (equal MB-aligned sizes).
    """
    from ..ops.tables import chroma_qp
    B = len(planes_batch)
    H, W = planes_batch[0][0].shape
    nb = H // (band_mb_rows * 16)
    mbw = W // 16
    y = np.stack([f[0] for f in planes_batch]).reshape(
        B, nb, band_mb_rows * 16, W)
    u = np.stack([f[1] for f in planes_batch]).reshape(
        B, nb, band_mb_rows * 8, W // 2)
    v = np.stack([f[2] for f in planes_batch]).reshape(
        B, nb, band_mb_rows * 8, W // 2)
    qp_mb = np.full((B, nb, band_mb_rows, mbw), qp, np.int32)
    qpc_mb = np.asarray(chroma_qp(qp_mb), np.int32)
    step = make_sharded_intra_step(mesh, W, band_mb_rows)
    sh = NamedSharding(mesh, P("stream", "band"))
    args = [jax.device_put(a, sh) for a in (y, u, v, qp_mb, qpc_mb)]
    return step(*args)
