"""Pipelines: end-to-end drivers mirroring the reference entry points."""
from mri_super_resolution_tpu.pipelines import master2d, superres3d, inr_erd, misr  # noqa: F401
