"""Fit engine: jitted scanned training loops and the MISR Trainer."""

from mri_super_resolution_tpu.fit.losses import mse, weighted_mse  # noqa: F401
from mri_super_resolution_tpu.fit.engine import (  # noqa: F401
    fit_simple,
    fit_ensemble,
    fit_until,
    fit_alternating_pn,
    infer_dense_grid,
    infer_grid,
    FitResult,
    EnsembleResult,
    AlternatingResult,
)
from mri_super_resolution_tpu.fit.trainer import Trainer, TrainState  # noqa: F401
