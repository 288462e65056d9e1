"""Cohort-parallel runner on the virtual 8-device CPU mesh."""
import numpy as np

from mri_super_resolution_tpu.data import Case
from mri_super_resolution_tpu.pipelines import cohort


def _mk_case(rng, pt) -> Case:
    H = W = 24
    S, A = 2, 3
    b0 = rng.uniform(0.5, 1.5, size=(H, W, S)).astype(np.float32)
    dwi = np.stack(
        [0.5 * b0 + 0.02 * rng.normal(size=(H, W, S)).astype(np.float32) for _ in range(A)],
        axis=-1,
    ).astype(np.float32)
    return Case(
        pt_id=f"00-0000-{pt}", b=900.0, cancer_loc=(12, 12),
        contralateral_loc=(8, 8), noise=(18, 18), cancer_slice=1,
        acquisitions=(1, 1, 1), dwi=dwi, b0=b0,
        erd=np.ones((H, W, S), np.float32), accept=np.ones(dwi.shape, np.int32),
        synthetic_dwi=True,
    )


class TestCohort:
    def test_runs_on_virtual_mesh(self, rng):
        cases = [_mk_case(rng, p) for p in ("01", "02", "03", "04")]
        res = cohort.run_cohort(
            cases, num_steps=20, hidden_features=16, hidden_layers=1,
            roi=(4, 20),
        )
        assert res.recons.shape == (4, 16, 16)
        assert res.losses.shape == (4, 20)
        # all cases trained (losses decreased)
        assert (res.losses[:, -1] < res.losses[:, 0]).all()
        assert res.voxels_per_sec > 0
        # on the 8-device CPU mesh with 4 cases, the case axis should be 4
        assert res.mesh_shape["case"] == 4

    def test_single_case_mesh(self, rng):
        cases = [_mk_case(rng, "09")]
        res = cohort.run_cohort(
            cases, num_steps=5, hidden_features=16, hidden_layers=1, roi=(4, 20)
        )
        assert res.recons.shape == (1, 16, 16)
        assert res.mesh_shape["case"] == 1
