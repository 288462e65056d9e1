"""Integration test for the MISR inference driver (pipelines/misr.py).

Reference behavior: multi-image-super-resolution/master.py:29-68 — per case,
draw random 9-acquisition subsets of the cancer slice, predict each with RAMS,
average, compute 3x ADC vs the rescaled b0, write DWI + ADC DICOMs. Exercises
the serving path end-to-end at tiny shapes, including the weight-norm folding
applied at restore.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mri_super_resolution_tpu.config import RAMSConfig
from mri_super_resolution_tpu.data.cases import Case
from mri_super_resolution_tpu.pipelines import misr


def _tiny_case(H=12, W=12, S=3, A=6, seed=0) -> Case:
    rng = np.random.default_rng(seed)
    return Case(
        pt_id="pat-99",
        b=800.0,
        cancer_loc=(4, 4),
        contralateral_loc=(8, 8),
        noise=(1, 1),
        cancer_slice=1,
        acquisitions=(A,),
        dwi=rng.uniform(6000, 9000, (H, W, S, A)).astype(np.float32),
        b0=rng.uniform(9000, 12000, (H, W, S)).astype(np.float32),
        erd=np.ones((H, W, S), np.float32),
        accept=np.ones((H, W, S, A), np.int32),
        synthetic_dwi=True,
    )


@pytest.fixture(scope="module")
def tiny_cfg():
    return RAMSConfig(filters=4, N=1, channels=9, r=2)


def test_run_writes_dicoms(tmp_path, tiny_cfg):
    case = _tiny_case()
    model = misr.build_rams(tiny_cfg)
    x = jnp.zeros((1, 12, 12, tiny_cfg.channels), jnp.float32)
    params = model.init(jax.random.key(0), x)
    misr.run([case], tiny_cfg, params, str(tmp_path), exp_name="t", sample_size=2)
    dwi = tmp_path / "t" / case.pt_no / "DWI" / "mean.dcm"
    adc = tmp_path / "t" / case.pt_no / "ADC" / "mean.dcm"
    assert dwi.exists() and adc.exists()
    # DICOM Part-10 magic at offset 128
    with open(dwi, "rb") as f:
        f.seek(128)
        assert f.read(4) == b"DICM"


def test_predict_case_shapes_and_adc(tiny_cfg):
    case = _tiny_case()
    model = misr.build_rams(tiny_cfg)
    x = jnp.zeros((1, 12, 12, tiny_cfg.channels), jnp.float32)
    params = model.init(jax.random.key(0), x)
    apply_fn = jax.jit(lambda t: model.apply(params, t))
    mean_pred, adc = misr.predict_case(apply_fn, case, tiny_cfg, sample_size=2)
    assert mean_pred.shape == (36, 36)
    assert adc.shape == (36, 36)
    assert np.isfinite(mean_pred).all() and np.isfinite(adc).all()
    # draws fewer acquisitions than channels -> replace-sampling path
    assert case.dwi.shape[-1] < tiny_cfg.channels
