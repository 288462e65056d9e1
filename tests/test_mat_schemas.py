"""Real-data schema hardening: fabricate .mat files with the EXACT layouts
the reference loads (nn_mri.py:46-54, INR_ERD.py:89-95,
superresHybrid.py:44-55) in both v5 and v7.3 containers, and prove every
loader in this framework — scipy path, h5py path, native C++ reader —
handles them (or fails with a precise message) before first contact with
real patient data.
"""
import numpy as np
import pytest

from mri_super_resolution_tpu.data.io import load_mat, save_mat, save_mat73


def _hybrid_cell(rng, shape=(8, 8, 3)):
    """master.mat 'hybrid_raw': 4x4 cell of per-(b, TE) acquisition stacks;
    b=0 holds a 3-D volume, b>0 hold 4-D (..., n_acq) stacks that the driver
    means over (superresHybrid.py:52-55)."""
    cell = np.empty((4, 4), dtype=object)
    for b in range(4):
        for te in range(4):
            s = shape if b == 0 else shape + (3,)
            cell[b, te] = rng.random(s).astype(np.float64)
    return cell


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# ---------------------------------------------------------------- pat* files

def _write_patient(tmp_path, rng, writer, pt_no="003"):
    dwi = rng.random((16, 16, 4, 6)).astype(np.float64)
    b0 = rng.random((16, 16, 4)).astype(np.float64)
    erd = rng.random((16, 16, 4)).astype(np.float64)
    writer(str(tmp_path / f"pat{pt_no}_alldata.mat"), {"data": dwi})
    writer(str(tmp_path / f"pat{pt_no}_mean_b0.mat"), {"data_mean_b0": b0})
    writer(str(tmp_path / f"pat{pt_no}_ERD.mat"), {"ADC_alldata_mm_ERD": erd})
    return dwi, b0, erd


@pytest.mark.parametrize("writer", [save_mat, save_mat73],
                         ids=["v5", "v7.3"])
def test_patient_schema_roundtrip(tmp_path, rng, writer):
    dwi, b0, erd = _write_patient(tmp_path, rng, writer)
    np.testing.assert_allclose(
        load_mat(str(tmp_path / "pat003_alldata.mat"), "data"), dwi)
    np.testing.assert_allclose(
        load_mat(str(tmp_path / "pat003_mean_b0.mat"), "data_mean_b0"), b0)
    np.testing.assert_allclose(
        load_mat(str(tmp_path / "pat003_ERD.mat"), "ADC_alldata_mm_ERD"), erd)


@pytest.mark.parametrize("writer", [save_mat, save_mat73],
                         ids=["v5", "v7.3"])
def test_case_load_on_fabricated_files(tmp_path, rng, writer):
    from mri_super_resolution_tpu.data.cases import Case

    dwi, b0, erd = _write_patient(tmp_path, rng, writer)
    case = Case.load(
        "prostate-003", b=900, cancer_loc=(8, 8), contralateral_loc=(8, 4),
        noise=(2, 2), cancer_slice=2, acquisitions=(2, 2, 2),
        data_dir=str(tmp_path), require_real=True,
    )
    assert not case.synthetic_dwi
    np.testing.assert_allclose(case.dwi, dwi.astype(np.float32))
    np.testing.assert_allclose(case.b0, b0.astype(np.float32))


@pytest.mark.parametrize("writer", [save_mat, save_mat73],
                         ids=["v5", "v7.3"])
def test_bigimage_schema(tmp_path, rng, writer):
    """INR_ERD.py:89-95 bigImage.mat: b0 (H,W,S) + b1..b3 (H,W,S,A)."""
    path = str(tmp_path / "bigImage.mat")
    vols = {"b0": rng.random((12, 12, 3))}
    for i in (1, 2, 3):
        vols[f"b{i}"] = rng.random((12, 12, 3, 4))
    writer(path, vols)
    got = load_mat(path)
    for k, v in vols.items():
        np.testing.assert_allclose(got[k], v)


# ------------------------------------------------------------- master.mat

@pytest.mark.parametrize("writer", [save_mat, save_mat73],
                         ids=["v5", "v7.3"])
def test_master_mat_cell_schema(tmp_path, rng, writer):
    from mri_super_resolution_tpu.pipelines.superres3d import load_hybrid

    cell = _hybrid_cell(rng)
    path = str(tmp_path / "master.mat")
    writer(path, {
        "hybrid_raw": cell,
        "b": np.array([[0.0, 150.0, 1000.0, 1500.0]]),
        "TE": np.array([[57.0, 70.0, 150.0, 200.0]]),
    })
    hybrid_raw, b = load_hybrid(path)
    assert list(b) == [0.0, 150.0, 1000.0, 1500.0]
    for bi in range(4):
        for te in range(4):
            got = np.asarray(hybrid_raw[bi][te], dtype=np.float64)
            np.testing.assert_allclose(got.reshape(cell[bi, te].shape),
                                       cell[bi, te])


# ------------------------------------------------------------- native reader

needs_native = pytest.mark.skipif(
    not __import__(
        "mri_super_resolution_tpu.data.native_io", fromlist=["available"]
    ).available(),
    reason="native toolchain unavailable",
)


@needs_native
def test_native_reads_master_cell_array(tmp_path, rng):
    from mri_super_resolution_tpu.data.native_io import load_mat_native

    cell = _hybrid_cell(rng)
    path = str(tmp_path / "master.mat")
    save_mat(path, {"hybrid_raw": cell,
                    "b": np.array([[0.0, 150.0, 1000.0, 1500.0]])})
    got = load_mat_native(path)
    assert got["hybrid_raw"].shape == (4, 4)
    for b in range(4):
        for te in range(4):
            np.testing.assert_allclose(got["hybrid_raw"][b][te], cell[b, te])
    np.testing.assert_allclose(got["b"].reshape(-1),
                               [0.0, 150.0, 1000.0, 1500.0])


@needs_native
def test_native_reads_nested_cells(tmp_path, rng):
    """Cell-of-cells: inner cells must reassemble BEFORE the outer cell pops
    them (deepest-first marker order), or the outer entries come back None."""
    from mri_super_resolution_tpu.data.native_io import load_mat_native

    inner0 = np.empty((2,), dtype=object)
    inner0[0] = rng.standard_normal((3, 2))
    inner0[1] = rng.standard_normal((2, 2))
    outer = np.empty((2,), dtype=object)
    outer[0] = inner0
    outer[1] = rng.standard_normal((4, 1))
    path = str(tmp_path / "nested.mat")
    save_mat(path, {"x": outer})
    got = load_mat_native(path)
    x = got["x"]
    assert x.reshape(-1)[1] is not None
    inner = x.reshape(-1)[0]
    assert inner is not None, "nested cell came back None (ordering bug)"
    np.testing.assert_allclose(np.asarray(inner.reshape(-1)[0]).squeeze(),
                               inner0[0].squeeze())
    np.testing.assert_allclose(np.asarray(x.reshape(-1)[1]).squeeze(),
                               outer[1].squeeze())


@needs_native
def test_native_decodes_struct(tmp_path, rng):
    """Struct variables decode natively (round-3: previously a skip note;
    the pat*_alldata.mat schemas are struct-heavy, so the fast path should
    carry them) — field access matches scipy's structured load."""
    import scipy.io as sio

    from mri_super_resolution_tpu.data.native_io import load_mat_native

    path = str(tmp_path / "structy.mat")
    data = rng.random((4, 4))
    sio.savemat(path, {
        "meta": {"pt_id": "prostate-003", "weight": 80.0},
        "data": data,
    })
    got = load_mat_native(path)
    assert "data" in got and "meta" in got
    ref = sio.loadmat(path)
    meta = got["meta"]
    assert meta.shape == ref["meta"].shape  # (1, 1) struct
    assert set(meta.dtype.names) == set(ref["meta"].dtype.names)
    assert meta["pt_id"][0, 0] == "prostate-003"
    np.testing.assert_allclose(
        np.asarray(meta["weight"][0, 0]).squeeze(), 80.0)
    np.testing.assert_allclose(got["data"], data)


@needs_native
def test_native_struct_array_with_nested_cell(tmp_path, rng):
    """2-element struct array whose field holds a cell array — the
    bigImage.mat-style nesting (INR_ERD.py:69-95)."""
    import scipy.io as sio

    from mri_super_resolution_tpu.data.native_io import load_mat_native

    a0, a1 = rng.random((2, 3)), rng.random((3, 2))
    c0 = rng.random((2, 2))
    rec = np.empty((1, 2), dtype=[("vol", object), ("cells", object)])
    cell = np.empty((1, 1), dtype=object)
    cell[0, 0] = c0
    rec["vol"][0, 0], rec["vol"][0, 1] = a0, a1
    rec["cells"][0, 0] = cell
    rec["cells"][0, 1] = cell
    path = str(tmp_path / "sarr.mat")
    sio.savemat(path, {"s": rec})
    got = load_mat_native(path, "s")
    assert got.shape == (1, 2)
    np.testing.assert_allclose(np.asarray(got["vol"][0, 0]), a0)
    np.testing.assert_allclose(np.asarray(got["vol"][0, 1]), a1)
    inner = got["cells"][0, 1]
    np.testing.assert_allclose(np.asarray(inner[0, 0]), c0)


@needs_native
def test_native_decodes_char(tmp_path):
    import scipy.io as sio

    from mri_super_resolution_tpu.data.native_io import load_mat_native

    path = str(tmp_path / "chars.mat")
    sio.savemat(path, {"label": "pat07-coronal"})
    assert load_mat_native(path, "label") == "pat07-coronal"


@needs_native
def test_native_matches_scipy_on_patient_files(tmp_path, rng):
    from mri_super_resolution_tpu.data.native_io import load_mat_native

    dwi, b0, erd = _write_patient(tmp_path, rng, save_mat)
    np.testing.assert_allclose(
        load_mat_native(str(tmp_path / "pat003_alldata.mat"), "data"), dwi)
    np.testing.assert_allclose(
        load_mat_native(str(tmp_path / "pat003_mean_b0.mat"), "data_mean_b0"),
        b0)
