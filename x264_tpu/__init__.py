"""x264-tpu: a TPU-native H.264/AVC encoder framework.

A from-scratch re-design of the capabilities of the reference x264 encoder
for TPU hardware: batched/wavefront tensor pipelines under JAX/XLA/Pallas for
the analysis+transform path, vectorized/native host code for the serial
entropy stage, and jax.sharding meshes in place of pthread parallelism.
"""

__version__ = "0.1.0"
X264_TPU_BUILD = 165  # capability parity target: reference X264_BUILD 165

from . import params  # noqa: F401
from .params import (  # noqa: F401
    Params, param_default, param_default_preset, param_parse,
    param_apply_profile, param_apply_fastfirstpass, ParamError,
)
