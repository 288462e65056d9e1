"""CLI-level real-data first-contact drill.

The distributed anon_data has no 4-D acquisition stacks, master.mat hybrids,
or bigImage.mat volumes (VERDICT r3 "Missing #1") — so the first real
patient file would otherwise be the first true test of every data-consuming
CLI. This drill fabricates BIT-FAITHFUL files at the exact layouts the
reference reads:

- master.mat: 4x4 'hybrid_raw' cell with RAGGED per-b acquisition counts +
  'b'/'TE' rows (superresDWI.py:40-48, superresHybrid.py:44-55),
- bigImage.mat: 'b0' (H,W,S) + 'b1'..'b3' (H,W,S,A) at the reference's
  <dir>/<pt_no>/no_aver/ layout (INR_ERD.py:89-95),
- pat*_alldata.mat / pat*_mean_b0.mat / pat*_ERD.mat (nn_mri.py:46-54),

in BOTH v5 and v7.3 containers, and runs the actual CLI ``main()``s on them
end-to-end — plus asserts precise first-contact error messages for
missing/malformed variables.
"""
from __future__ import annotations

import csv
import importlib
import os

import numpy as np
import pytest

from mri_super_resolution_tpu.data.io import load_mat, save_mat, save_mat73


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _master_mat(path, rng, writer, shape=(24, 24, 4), acq=(1, 3, 2, 4)):
    """Full master.mat: ragged per-b acquisition counts (b=0 is a bare
    volume; b>0 carry different n_acq, as real scans do)."""
    cell = np.empty((4, 4), dtype=object)
    for b in range(4):
        for te in range(4):
            s = shape if b == 0 else shape + (acq[b],)
            base = rng.uniform(0.1, 1.0, shape).astype(np.float64)
            vol = (base[..., None].repeat(acq[b], -1)
                   + rng.normal(0, 0.02, s)) if b else base
            cell[b, te] = np.clip(vol, 1e-3, None) * (400.0 / (1 + b))
    writer(path, {
        "hybrid_raw": cell,
        "b": np.array([[0.0, 150.0, 1000.0, 1500.0]]),
        "TE": np.array([[57.0, 70.0, 150.0, 200.0]]),
    })
    return cell


@pytest.mark.parametrize("writer", [save_mat, save_mat73], ids=["v5", "v7.3"])
def test_superres_dwi_cli_on_master_mat(tmp_path, rng, writer):
    """superresDWI driver end-to-end on a fabricated master.mat (both
    containers; v7.3 additionally runs the grid/z-bucketed preset)."""
    mat = str(tmp_path / "777" / "master.mat")  # dir name -> pt_id "777"
    os.makedirs(os.path.dirname(mat))
    _master_mat(mat, rng, writer)
    out = str(tmp_path / "SR")
    args = ["--master_mats", mat, "--epochs", "8", "--pn_epochs", "2",
            "--hidden_dim", "32", "--num_layers", "1", "--mapping_size", "8",
            "--roi_start", "2", "--roi_end", "19", "--out", out]
    if writer is save_mat73:
        args += ["--preset", "quality", "--epochs", "8"]
    importlib.import_module("cli.superres_dwi").main(args)
    csv_path = os.path.join(out, "pat777", "ssim_scores.csv")  # run() adds "pat"
    assert os.path.exists(csv_path)
    with open(csv_path) as f:
        rows = list(csv.reader(f))
    assert len(rows) == 1 + 4 * 4  # header + S*4 b-values
    assert os.path.exists(os.path.join(out, "timings.json"))


def test_superres_hybrid_cli_on_master_mat(tmp_path, rng):
    """superresHybrid driver end-to-end on the same fabricated master.mat."""
    mat = str(tmp_path / "778" / "master.mat")  # dir name -> pt_id "778"
    os.makedirs(os.path.dirname(mat))
    _master_mat(mat, rng, save_mat)
    out = str(tmp_path / "HY")
    importlib.import_module("cli.superres_hybrid").main(
        ["--master_mats", mat, "--epochs", "6", "--hidden_dim", "32",
         "--num_layers", "1", "--mapping_size", "8", "--nlls_iters", "3",
         "--roi_start", "2", "--roi_end", "19", "--out", out])
    pdir = os.path.join(out, "pat778")
    assert any(f.startswith("maps_slice_") and f.endswith(".npz")
               for f in os.listdir(pdir))
    assert os.path.exists(os.path.join(out, "timings.json"))


@pytest.mark.parametrize("writer", [save_mat, save_mat73], ids=["v5", "v7.3"])
def test_master_cli_on_alldata(tmp_path, rng, writer):
    """master.py flagship CLI end-to-end on fabricated pat07 alldata files
    (full 128x128 frame so the hard-coded cancer/noise pixel coords of the
    case table resolve)."""
    S = 13  # > cancer_slice 11 of pt 18-1681-07
    dwi = rng.uniform(0, 400, (128, 128, S, 27)).astype(np.float32)
    b0 = rng.uniform(0, 400, (128, 128, S)).astype(np.float32)
    erd = rng.uniform(0, 3, (128, 128, S)).astype(np.float32)
    writer(str(tmp_path / "pat07_alldata.mat"), {"data": dwi})
    writer(str(tmp_path / "pat07_mean_b0.mat"), {"data_mean_b0": b0})
    writer(str(tmp_path / "pat07_ERD.mat"), {"ADC_alldata_mm_ERD": erd})
    out_f = str(tmp_path / "exp") + "/"
    out_i = str(tmp_path / "img") + "/"
    importlib.import_module("cli.master").main(
        ["--total_steps", "6", "--seg", "2", "--repeat_time", "1",
         "--limit_cases", "1", "--exp_name", "drill", "--data_dir",
         str(tmp_path), "--out_folder", out_f, "--out_img_folder", out_i])
    csvs = [f for f in os.listdir(out_f) if f.endswith(".csv")]
    assert csvs, "master CLI wrote no contrast CSV"
    dicoms = [os.path.join(r, f) for r, _, fs in os.walk(out_i)
              for f in fs if f.endswith(".dcm")]
    assert dicoms, "master CLI wrote no DICOMs"


def test_inr_erd_cli_on_bigimage(tmp_path, rng):
    """INR_ERD CLI end-to-end consuming a REAL-schema bigImage.mat at the
    reference's <dir>/<pt_no>/no_aver/ layout."""
    S = 13
    b0 = rng.uniform(0, 400, (128, 128, S)).astype(np.float64)
    vols = {"b0": b0}
    for i in (1, 2, 3):
        vols[f"b{i}"] = rng.uniform(0, 400 / (i + 1),
                                    (128, 128, S, 3)).astype(np.float64)
    # mean_b0 must exist for available_patients() to list the case
    save_mat(str(tmp_path / "pat07_mean_b0.mat"),
             {"data_mean_b0": b0.astype(np.float32)})
    os.makedirs(tmp_path / "07" / "no_aver")
    save_mat(str(tmp_path / "07" / "no_aver" / "bigImage.mat"), vols)

    # unit: build_cases prefers the real file and unit-scales it
    cli = importlib.import_module("cli.inr_erd")
    cases = cli.build_cases(limit=1, data_dir=str(tmp_path))
    assert len(cases) == 1
    np.testing.assert_allclose(
        cases[0].b0, (b0 / (b0.max() + 1e-12)).astype(np.float32), rtol=1e-5)
    assert cases[0].b3.shape == (128, 128, S, 3)

    out_csv = str(tmp_path / "experiments.csv")
    cli.main(["--limit_cases", "1", "--seeds", "1", "--loss_threshold", "0.5",
              "--hidden_features", "16", "--hidden_layers", "1",
              "--data_dir", str(tmp_path), "--out_csv", out_csv,
              "--models_dir", str(tmp_path / "models")])
    with open(out_csv) as f:
        rows = list(csv.reader(f))
    assert len(rows) >= 2  # header + at least one metric row


class TestFirstContactErrors:
    """Malformed/missing fields fail with precise, named messages."""

    def test_missing_hybrid_raw(self, tmp_path, rng):
        from mri_super_resolution_tpu.pipelines.superres3d import load_hybrid

        path = str(tmp_path / "master.mat")
        save_mat(path, {"b": np.array([[0.0, 150.0, 1000.0, 1500.0]])})
        with pytest.raises(ValueError, match="hybrid_raw.*contains.*'b'"):
            load_hybrid(path)

    def test_wrong_cell_shape(self, tmp_path, rng):
        from mri_super_resolution_tpu.pipelines.superres3d import load_hybrid

        cell = np.empty((3, 4), dtype=object)
        for b in range(3):
            for te in range(4):
                cell[b, te] = rng.random((4, 4, 2))
        path = str(tmp_path / "master.mat")
        save_mat(path, {"hybrid_raw": cell, "b": np.zeros((1, 4))})
        with pytest.raises(ValueError, match="3x4, expected"):
            load_hybrid(path)

    def test_inconsistent_spatial_shapes(self, tmp_path, rng):
        from mri_super_resolution_tpu.pipelines.superres3d import load_hybrid

        cell = np.empty((4, 4), dtype=object)
        for b in range(4):
            for te in range(4):
                cell[b, te] = rng.random((4, 4, 2))
        cell[2, 1] = rng.random((5, 4, 2))
        path = str(tmp_path / "master.mat")
        save_mat(path, {"hybrid_raw": cell, "b": np.zeros((1, 4))})
        with pytest.raises(ValueError, match=r"hybrid_raw\[2\]\[1\]"):
            load_hybrid(path)

    def test_wrong_b_count(self, tmp_path, rng):
        from mri_super_resolution_tpu.pipelines.superres3d import load_hybrid

        cell = np.empty((4, 4), dtype=object)
        for b in range(4):
            for te in range(4):
                cell[b, te] = rng.random((4, 4, 2))
        path = str(tmp_path / "master.mat")
        save_mat(path, {"hybrid_raw": cell, "b": np.zeros((1, 3))})
        with pytest.raises(ValueError, match="3 entries, expected 4"):
            load_hybrid(path)

    def test_bigimage_missing_var(self, tmp_path, rng):
        cli = importlib.import_module("cli.inr_erd")
        path = str(tmp_path / "bigImage.mat")
        save_mat(path, {"b0": rng.random((4, 4, 2)),
                        "b1": rng.random((4, 4, 2, 3))})
        with pytest.raises(ValueError, match=r"\['b2', 'b3'\].*contains"):
            cli._load_bigimage(path)

    def test_bigimage_bad_b3_shape(self, tmp_path, rng):
        cli = importlib.import_module("cli.inr_erd")
        path = str(tmp_path / "bigImage.mat")
        save_mat(path, {"b0": rng.random((4, 4, 2)),
                        "b1": rng.random((4, 4, 2, 3)),
                        "b2": rng.random((4, 4, 2, 3)),
                        "b3": rng.random((5, 4, 2, 3))})
        with pytest.raises(ValueError, match="'b3' has shape"):
            cli._load_bigimage(path)

    def test_load_mat_missing_key_names_file_and_contents(self, tmp_path):
        path = str(tmp_path / "x.mat")
        save_mat(path, {"present": np.zeros((2, 2))})
        with pytest.raises(KeyError, match="'absent'.*present"):
            load_mat(path, "absent")
