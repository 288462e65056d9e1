"""Data layer: case registry, .mat IO, datasets, combination expansion."""

from mri_super_resolution_tpu.data.io import (  # noqa: F401
    load_mat,
    save_mat,
    save_dicom,
    read_dicom_pixels,
    MetricsCSV,
    CONTRAST_HEADER,
    SSIM_HEADER,
    CNR_SNR_HEADER,
)
from mri_super_resolution_tpu.data.cases import (  # noqa: F401
    Case,
    CASE_TABLE,
    available_patients,
    load_cases,
)
from mri_super_resolution_tpu.data.datasets import (  # noqa: F401
    ImageFittingSet,
    flatten_weights,
)
from mri_super_resolution_tpu.data.combinations import (  # noqa: F401
    combination_mean,
    expand_combinations,
    expand_from_hybrid,
)
from mri_super_resolution_tpu.data import synthetic  # noqa: F401
