"""Tests for qual-study prep, ERD-stats driver, and analysis utilities."""
import os

import numpy as np

from mri_super_resolution_tpu.config import INRERDConfig
from mri_super_resolution_tpu.data import Case
from mri_super_resolution_tpu.pipelines import erd_stats, qual_study
from mri_super_resolution_tpu.pipelines.inr_erd import ERDCase
from mri_super_resolution_tpu.utils import analysis


def _tiny_erd_case(rng) -> ERDCase:
    H = W = 32
    S, A = 2, 4
    b0 = rng.uniform(0.8, 1.6, size=(H, W, S)).astype(np.float32)
    b3 = np.stack(
        [0.5 * b0 + 0.02 * rng.normal(size=(H, W, S)).astype(np.float32) for _ in range(A)],
        axis=-1,
    ).astype(np.float32)
    return ERDCase(
        pt_id="18-1681-88", b=(0, 150, 1000, 1500),
        cancer_loc=(16, 16), contralateral_loc=(10, 10), noise=(24, 24),
        cancer_slice=1, b0=b0, b3=b3,
    )


def _tiny_case(rng) -> Case:
    H = W = 32
    S, A = 2, 6
    b0 = rng.uniform(0.5, 1.5, size=(H, W, S)).astype(np.float32)
    dwi = np.stack(
        [0.6 * b0 + 0.02 * rng.normal(size=(H, W, S)).astype(np.float32) for _ in range(A)],
        axis=-1,
    ).astype(np.float32)
    return Case(
        pt_id="00-0000-55", b=900.0, cancer_loc=(16, 16),
        contralateral_loc=(10, 10), noise=(24, 24), cancer_slice=1,
        acquisitions=(2, 2, 2), dwi=dwi, b0=b0,
        erd=np.ones((H, W, S), np.float32), accept=np.ones(dwi.shape, np.int32),
        synthetic_dwi=True,
    )


class TestQualStudy:
    def test_build_and_save_panel(self, rng, tmp_path):
        case = _tiny_erd_case(rng)
        cfg = INRERDConfig(hidden_features=24, hidden_layers=1, loss_threshold=5e-3)
        panel = qual_study.build_panel(case, _slice=1, cfg=cfg, seed=0, fine_tune_steps=5)
        assert panel.low.shape == (16, 16)
        assert panel.sr.shape == (32, 32)
        assert panel.base.shape == (32, 32)
        assert sorted(panel.order) == sorted(qual_study.ARMS)
        row = qual_study.save_panel(panel, str(tmp_path / "p.png"))
        assert os.path.exists(tmp_path / "p.png")
        assert sorted(row.values()) == sorted(qual_study.ARMS)

    def test_score_panels(self, rng, tmp_path):
        case = _tiny_erd_case(rng)
        cfg = INRERDConfig(hidden_features=24, hidden_layers=1, loss_threshold=5e-3)
        panel = qual_study.build_panel(case, _slice=0, cfg=cfg, seed=1, fine_tune_steps=3)
        out = qual_study.score_panels({300: panel}, str(tmp_path / "scores.csv"))
        lines = open(out).read().splitlines()
        assert len(lines) == 2
        assert "FSIM_SR" in lines[0]


class TestERDStats:
    def test_csv_schema_and_rows(self, rng, tmp_path):
        case = _tiny_case(rng)
        path = erd_stats.run([case], str(tmp_path), "david_test")
        lines = open(path).read().splitlines()
        assert lines[0] == "patient,image,direction,acquisition,metric,performance"
        # per direction: 2 acq x 2 imgs x 2 metrics + 4 means x 2 metrics = 16
        assert len(lines) - 1 == 3 * (2 * 2 * 2 + 4 * 2)


class TestAnalysis:
    def test_summarize_and_plot(self, tmp_path):
        import pandas as pd

        df = pd.DataFrame(
            {
                "seed": [0] * 8,
                "patient": ["07"] * 8,
                "direction": ["x"] * 8,
                "image": ["mean", "superres"] * 4,
                "metric": ["CNR"] * 8,
                "performance": np.arange(8.0),
            }
        )
        summary = analysis.summarize_contrast(df, "CNR")
        assert set(summary.index) == {"mean", "superres"}
        out = analysis.barplot_metric(df, "CNR", str(tmp_path / "bar.png"))
        assert os.path.exists(out)

    def test_epoch_filmstrip_and_gif(self, rng, tmp_path):
        snaps = rng.uniform(size=(16, 16, 5)).astype(np.float32)
        p1 = analysis.epoch_filmstrip(snaps, snaps[..., -1], str(tmp_path / "f.png"))
        assert os.path.exists(p1)
        p2 = analysis.epoch_gif(snaps, str(tmp_path / "e.gif"))
        assert os.path.exists(p2)
