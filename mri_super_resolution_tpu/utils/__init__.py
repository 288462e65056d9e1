"""Utilities: profiling, checkpointing, config."""

from mri_super_resolution_tpu.utils.profiling import (  # noqa: F401
    Throughput,
    trace,
    time_jitted,
)
from mri_super_resolution_tpu.utils.checkpoint import (  # noqa: F401
    save_pytree,
    restore_pytree,
    unwrap_trainer_params,
    CheckpointManager,
)
from mri_super_resolution_tpu.utils import analysis  # noqa: F401
