"""Patient case registry and .mat loading.

Reference equivalents:
- ``Case`` — the ``case`` classes (implicit-neural-representations/nn_mri.py:29-54,
  INR_ERD.py:69-95, multi-image-super-resolution/nn_mri.py:17-45): per-patient
  record with 4-D DWI ``(H, W, S, A)``, mean b0 ``(H, W, S)``, ERD ADC map,
  cancer/contralateral/noise pixel locations, cancer slice, and per-direction
  acquisition counts.
- ``CASE_TABLE`` — the hard-coded case lists (master.py module scope via
  ``from nn_mri import cases``; INR_ERD.py:310-322).

The repository's anon_data ships only ``pat*_mean_b0.mat`` and ``pat*_ERD.mat``;
the 4-D ``pat*_alldata.mat`` volumes referenced by the original loader are not
distributed. ``Case.load`` therefore synthesises repeated noisy acquisitions
from the mean b0 volume when ``alldata`` is missing (deterministic per-patient
seed), so every pipeline stays runnable end-to-end on the committed data. Set
``require_real=True`` to fail instead.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Sequence

import numpy as np

from mri_super_resolution_tpu.data import synthetic

DEFAULT_DATA_DIR = os.environ.get(
    "MRI_SR_DATA_DIR", "/root/reference/anon_data"
)


from mri_super_resolution_tpu.data.io import load_mat  # noqa: F401 (re-export)


@dataclasses.dataclass
class Case:
    """One patient: volumes + annotation. Arrays are host numpy; pipelines move
    the slices they need onto device."""

    pt_id: str
    b: float | tuple
    cancer_loc: tuple[int, int]
    contralateral_loc: tuple[int, int]
    noise: tuple[int, int]
    cancer_slice: int
    acquisitions: tuple[int, ...]  # acquisition counts per gradient direction
    dwi: np.ndarray  # (H, W, S, A)
    b0: np.ndarray  # (H, W, S)
    erd: np.ndarray  # (H, W, S)
    accept: np.ndarray  # (H, W, S, A) int mask
    synthetic_dwi: bool = False

    @property
    def pt_no(self) -> str:
        return self.pt_id.split("-")[-1]

    @classmethod
    def load(
        cls,
        pt_id: str,
        b: float,
        cancer_loc: tuple[int, int],
        contralateral_loc: tuple[int, int],
        noise: tuple[int, int],
        cancer_slice: int,
        acquisitions: Sequence[int],
        data_dir: str = DEFAULT_DATA_DIR,
        require_real: bool = False,
        preloaded: dict | None = None,
    ) -> "Case":
        """``preloaded``: optional {path: {var: array}} mapping filled by the
        native prefetch pool (load_cases) — volumes decoded on background
        threads while earlier cases build, instead of blocking per call
        (the reference's serialised scipy loads, nn_mri.py:46-54)."""

        def _var(path, var):
            if preloaded is not None and path in preloaded:
                arrays = preloaded[path]
                if var in arrays:
                    return arrays[var]
                # the native reader decoded the file but skipped this
                # variable (complex/object/...): keep the documented
                # "falls back on any failure" contract per-variable
            return load_mat(path, var, prefer_native=True)

        pt_no = pt_id.split("-")[-1]
        b0 = np.asarray(
            _var(os.path.join(data_dir, f"pat{pt_no}_mean_b0.mat"), "data_mean_b0"),
            dtype=np.float32,
        )
        erd = np.asarray(
            _var(os.path.join(data_dir, f"pat{pt_no}_ERD.mat"), "ADC_alldata_mm_ERD"),
            dtype=np.float32,
        )
        alldata_path = os.path.join(data_dir, f"pat{pt_no}_alldata.mat")
        synthetic_dwi = False
        if os.path.exists(alldata_path):
            dwi = np.asarray(_var(alldata_path, "data"), dtype=np.float32)
        else:
            if require_real:
                raise FileNotFoundError(alldata_path)
            dwi = synthetic.acquisitions_from_b0(
                b0, num_acq=int(sum(acquisitions)), b=float(b), seed=int(pt_no)
            )
            synthetic_dwi = True
        accept = np.ones(dwi.shape, dtype=np.int32)
        return cls(
            pt_id=pt_id,
            b=b,
            cancer_loc=tuple(cancer_loc),
            contralateral_loc=tuple(contralateral_loc),
            noise=tuple(noise),
            cancer_slice=int(cancer_slice),
            acquisitions=tuple(int(a) for a in acquisitions),
            dwi=dwi,
            b0=b0,
            erd=erd,
            accept=accept,
            synthetic_dwi=synthetic_dwi,
        )


# Case annotation table. Locations/slices follow the soft-ERD study's registry
# (INR_ERD.py:310-322, which lists cancer/contralateral/noise pixels and the
# cancer slice for these anon patients); b-values per that table's erc flag
# (b[3]=900 for the 0-flag group protocol used in master.py, 9 acquisitions per
# direction as in the directional ensemble study).
CASE_TABLE = (
    dict(pt_id="18-1681-07", b=900.0, cancer_loc=(67, 73), contralateral_loc=(63, 57), noise=(80, 65), cancer_slice=11, acquisitions=(9, 9, 9)),
    dict(pt_id="18-1681-08", b=900.0, cancer_loc=(80, 74), contralateral_loc=(77, 54), noise=(97, 65), cancer_slice=10, acquisitions=(9, 9, 9)),
    dict(pt_id="18-1681-09", b=900.0, cancer_loc=(62, 64), contralateral_loc=(56, 70), noise=(76, 62), cancer_slice=15, acquisitions=(9, 9, 9)),
    dict(pt_id="18-1681-30", b=900.0, cancer_loc=(67, 54), contralateral_loc=(66, 78), noise=(84, 64), cancer_slice=17, acquisitions=(9, 9, 9)),
    dict(pt_id="18-1681-37", b=900.0, cancer_loc=(68, 76), contralateral_loc=(71, 59), noise=(80, 67), cancer_slice=10, acquisitions=(9, 9, 9)),
    dict(pt_id="17-1694-82", b=1500.0, cancer_loc=(56, 52), contralateral_loc=(56, 74), noise=(80, 60), cancer_slice=16, acquisitions=(9, 9, 9)),
    dict(pt_id="18-1681-41", b=1500.0, cancer_loc=(69, 57), contralateral_loc=(69, 69), noise=(86, 65), cancer_slice=8, acquisitions=(9, 9, 9)),
    dict(pt_id="18-1694-76", b=1500.0, cancer_loc=(73, 69), contralateral_loc=(73, 52), noise=(90, 64), cancer_slice=16, acquisitions=(9, 9, 9)),
    dict(pt_id="18-1681-45", b=1500.0, cancer_loc=(71, 68), contralateral_loc=(65, 74), noise=(87, 62), cancer_slice=13, acquisitions=(9, 9, 9)),
    dict(pt_id="18-1694-78", b=1500.0, cancer_loc=(62, 76), contralateral_loc=(63, 53), noise=(78, 60), cancer_slice=20, acquisitions=(9, 9, 9)),
)


def available_patients(data_dir: str = DEFAULT_DATA_DIR) -> list[dict]:
    """Rows of CASE_TABLE whose mean_b0 file exists under ``data_dir``."""
    rows = []
    for row in CASE_TABLE:
        pt_no = row["pt_id"].split("-")[-1]
        if os.path.exists(os.path.join(data_dir, f"pat{pt_no}_mean_b0.mat")):
            rows.append(row)
    return rows


def load_cases(
    data_dir: str = DEFAULT_DATA_DIR, limit: int | None = None
) -> list[Case]:
    """Load every available case (the module-scope ``cases`` list analog).

    With the native runtime available, every case's .mat files are submitted
    to the C++ prefetch pool up front, so disk IO + v5 decoding overlap the
    numpy-side case assembly instead of serialising with it."""
    rows = available_patients(data_dir)
    if limit is not None:
        rows = rows[:limit]

    preloaded = None
    from mri_super_resolution_tpu.data import native_io

    if native_io.available():
        paths = []
        for row in rows:
            pt_no = row["pt_id"].split("-")[-1]
            for stem in (f"pat{pt_no}_mean_b0.mat", f"pat{pt_no}_ERD.mat",
                         f"pat{pt_no}_alldata.mat"):
                p = os.path.join(data_dir, stem)
                if os.path.exists(p):
                    paths.append(p)
        try:
            pf = native_io.Prefetcher()
            handles = [(p, pf.submit(p)) for p in paths]
            preloaded = {}
            for p, h in handles:
                try:
                    preloaded[p] = pf.get(h)
                except (RuntimeError, TimeoutError):
                    pass  # that file falls back to the scipy path
        except RuntimeError:
            preloaded = None

    return [Case.load(data_dir=data_dir, preloaded=preloaded, **row)
            for row in rows]
