"""Pipelines: end-to-end drivers mirroring the reference entry points."""

from mri_super_resolution_tpu.pipelines import (  # noqa: F401
    master2d,
    superres3d,
    inr_erd,
    misr,
    cohort,
    hybrid,
    pia_train,
    erd_stats,
    qual_study,
)
