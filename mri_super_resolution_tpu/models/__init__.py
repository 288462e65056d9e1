"""Model zoo: SIREN family, PerturbNet, WIRE, PIA, RAMS."""

from mri_super_resolution_tpu.models.siren import (  # noqa: F401
    set_precision,
    SineLayer,
    Siren,
    SirenERD,
    SirenToy,
)
from mri_super_resolution_tpu.models.perturbnet import PerturbNet  # noqa: F401
from mri_super_resolution_tpu.models.wire import Wire, ComplexGaborLayer  # noqa: F401
from mri_super_resolution_tpu.models.pia import (  # noqa: F401
    PIA,
    signal_model,
    pia_loss_unsupervised,
    pia_loss_supervised,
    synthetic_batch,
)
from mri_super_resolution_tpu.models.rams import RAMS  # noqa: F401
from mri_super_resolution_tpu.models.grid_inr import GridINR, GridINR2D  # noqa: F401
