"""Core numerics: coordinate grids, encodings, ADC, metrics, interpolation."""

from mri_super_resolution_tpu.core.coords import (  # noqa: F401
    mgrid,
    mgrid_square,
    fourier_matrix,
    fourier_encode,
    chunked_coords,
)
from mri_super_resolution_tpu.core.adc import adc_log_ratio, adc_polyfit  # noqa: F401
from mri_super_resolution_tpu.core.metrics import (  # noqa: F401
    minmax_normalize,
    contrast_cnr,
    cnr_snr_log10,
    ssim,
    psnr,
    masked_ssim_protocol,
)
from mri_super_resolution_tpu.core.interp import rescale, resize_along_axis  # noqa: F401
from mri_super_resolution_tpu.core.normalize import (  # noqa: F401
    to_tensor_normalize,
    from_tensor_normalize,
    per_bte_max_normalize,
    max_normalize,
    rayleigh_noise_std,
)
from mri_super_resolution_tpu.core.autodiff import gradient, divergence, laplace  # noqa: F401
