"""Pallas TPU kernels (SURVEY §7.1 design stance: fused VMEM-resident
kernels for the latency-bound stages; each has a pure-JAX twin and a
bit-exactness golden test, the checkasm discipline of SURVEY §4.1)."""

from .commit import commit_i16_pallas  # noqa: F401
