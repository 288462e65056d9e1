"""Compute ops: ERD rejection, shift-tolerant metrics, NLLS, Pallas kernels."""

from mri_super_resolution_tpu.ops.erd import (  # noqa: F401
    auto_erd,
    soft_erd_mean,
    soft_erd_weights,
)
