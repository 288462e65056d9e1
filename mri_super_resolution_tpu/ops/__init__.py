"""Compute ops: ERD rejection, shift-tolerant metrics, TTA, NLLS, Pallas kernels."""

from mri_super_resolution_tpu.ops.erd import (  # noqa: F401
    auto_erd,
    soft_erd_mean,
    soft_erd_weights,
)
from mri_super_resolution_tpu.ops.shift_metrics import (  # noqa: F401
    shift_l1_loss,
    shift_psnr,
    shift_ssim,
    ssim_tf,
)
from mri_super_resolution_tpu.ops.tta import (  # noqa: F401
    predict_tensor,
    geometric_ensemble_predict,
    temporal_permute_predict,
)
from mri_super_resolution_tpu.ops.nlls import hybrid_fit  # noqa: F401
from mri_super_resolution_tpu.ops.pids import detect_pids_slice, pids_weight_map  # noqa: F401
from mri_super_resolution_tpu.ops import perceptual  # noqa: F401
