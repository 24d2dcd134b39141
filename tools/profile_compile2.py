"""Which XLA programs does the bench config compile, and what does each
cost? Runs a short Encoder session with jax_log_compiles, then stage-wise
AOT compiles, then a 2-thread parallel-compile probe (remote_compile may
parallelize)."""
import logging
import sys
import time


def main():
    import jax
    jax.config.update("jax_log_compiles", True)
    logging.getLogger("jax._src.dispatch").setLevel(logging.WARNING)
    logging.basicConfig(level=logging.WARNING, stream=sys.stderr)

    import numpy as np
    from x264_tpu import param_default_preset
    from x264_tpu.encoder.encoder import Encoder, Picture
    import bench

    frames = bench.synth_clip(6)
    p = param_default_preset("medium")
    p.width, p.height = 1920, 1080
    p.cabac = False
    p.bframe = 0
    p.rc.rc_method = 0
    p.rc.qp_constant = 26
    p.analyse.psnr = False
    p.analyse.ssim = False

    enc = Encoder(p)
    for i in range(5):
        t1 = time.time()
        enc.encode(Picture(frames[i], pts=i))
        print(f"frame {i}: {time.time()-t1:6.2f}s", flush=True)


if __name__ == "__main__":
    main()
