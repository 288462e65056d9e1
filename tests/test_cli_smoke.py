"""CLI wiring smoke tests.

The pipelines under the CLIs have their own integration tests; what was
untested until now is the argparse layer itself — flag names, defaults,
and the args -> config -> pipeline wiring inside each ``main()``. The
reference drives everything through exactly these entry points
(implicit-neural-representations/master.py:25-41, run.sh:1-19), so a
broken flag is a broken product even when the library is green.

Two tiers:
  * every CLI parses ``--help`` (catches import errors, duplicate or
    malformed ``add_argument`` calls, bad ``description=__doc__`` wiring);
  * the cheap CLIs run end-to-end on tiny inputs (david, analyze_results,
    inr_toy) so the args->pipeline plumbing is executed, not just parsed.
"""
from __future__ import annotations

import csv
import importlib
import os

import pytest

CLI_MODULES = [
    "cli.analyze_results",
    "cli.automate_inr",
    "cli.cohort_run",
    "cli.david",
    "cli.export_model",
    "cli.inr_erd",
    "cli.inr_toy",
    "cli.master",
    "cli.misr_master",
    "cli.pia",
    "cli.prepare_qual_images",
    "cli.select_lrs",
    "cli.superres_dwi",
    "cli.superres_hybrid",
    "cli.superres_lowres",
    "cli.train_misr",
]


@pytest.mark.parametrize("module_name", CLI_MODULES)
def test_help_parses(module_name, capsys):
    mod = importlib.import_module(module_name)
    with pytest.raises(SystemExit) as exc:
        mod.main(["--help"])
    assert exc.value.code == 0
    out = capsys.readouterr().out
    assert "--help" in out or "usage" in out.lower()


def _have_anon_data() -> bool:
    from mri_super_resolution_tpu.data import available_patients

    return bool(available_patients())


@pytest.mark.skipif(not _have_anon_data(), reason="anon_data not present")
def test_david_end_to_end(tmp_path):
    """ERD-only contrast stats: full args -> load_cases -> erd_stats.run."""
    mod = importlib.import_module("cli.david")
    mod.main(
        [
            "--limit_cases",
            "1",
            "--out_folder",
            str(tmp_path),
            "--experiment_name",
            "smoke",
        ]
    )
    csvs = [f for f in os.listdir(tmp_path) if f.endswith(".csv")]
    assert csvs, "david CLI wrote no metrics CSV"


def test_analyze_results_end_to_end(tmp_path):
    """master.py-schema CSV -> summary tables + barplot PNGs."""
    path = tmp_path / "metrics.csv"
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["seed", "patient", "direction", "image", "metric", "performance"])
        for seed in (0, 1):
            for image in ("low", "SR"):
                for metric, val in (("C", 1.2), ("CNR", 3.4), ("CNR2", 5.6)):
                    w.writerow([seed, "07", "x", image, metric, val + seed * 0.1])
    out_dir = tmp_path / "analysis"
    mod = importlib.import_module("cli.analyze_results")
    mod.main([str(path), "--metrics", "C", "CNR", "--out_dir", str(out_dir)])
    assert (out_dir / "C.png").exists()
    assert (out_dir / "CNR.png").exists()


def test_export_model_end_to_end(tmp_path):
    """save_pytree params -> export_model CLI -> --check roundtrip passes."""
    import jax
    import jax.numpy as jnp

    from mri_super_resolution_tpu.models import SirenToy
    from mri_super_resolution_tpu.utils import save_pytree

    model = SirenToy(hidden_features=16, hidden_layers=1)
    params = model.init(jax.random.key(0), jnp.zeros((1, 2)))
    params_dir = tmp_path / "params"
    save_pytree(str(params_dir), params)

    mod = importlib.import_module("cli.export_model")
    mod.main(
        [
            "inr",
            "--params",
            str(params_dir),
            "--model",
            "siren_toy",
            "--hidden_features",
            "16",
            "--hidden_layers",
            "1",
            "--out",
            str(tmp_path / "artifact"),
            "--platforms",
            "cpu",
            "--check",
        ]
    )
    assert (tmp_path / "artifact" / "module.jaxexport").exists()


def test_export_model_grid_end_to_end(tmp_path):
    """save_pytree GridINR params -> export_model grid CLI -> --check passes
    (roundtrip vs the live z-bucketed tensor inference)."""
    import jax
    import jax.numpy as jnp

    from mri_super_resolution_tpu.models import GridINR
    from mri_super_resolution_tpu.utils import save_pytree

    model = GridINR(num_levels=2, base_resolution=4, features_per_level=2,
                    hidden=8, z_divisor=1)
    params = model.init(jax.random.key(0), jnp.zeros((1, 4)))
    params_dir = tmp_path / "params"
    save_pytree(str(params_dir), params)

    mod = importlib.import_module("cli.export_model")
    mod.main(
        [
            "grid",
            "--params", str(params_dir),
            "--levels", "2",
            "--base_resolution", "4",
            "--features", "2",
            "--hidden", "8",
            "--z_divisor", "1",
            "--out", str(tmp_path / "artifact"),
            "--platforms", "cpu",
            "--check",
        ]
    )
    assert (tmp_path / "artifact" / "module.jaxexport").exists()


def test_inr_toy_end_to_end(tmp_path):
    """Tiny synthetic fit: one scan chunk, early-stop check, orbax save."""
    mod = importlib.import_module("cli.inr_toy")
    out = tmp_path / "toy_model"
    mod.main(
        [
            "--side",
            "16",
            "--num_acq",
            "2",
            "--hidden_features",
            "16",
            "--hidden_layers",
            "1",
            "--check_every",
            "5",
            "--max_steps",
            "10",
            "--out",
            str(out),
        ]
    )
    assert out.exists(), "inr_toy saved no checkpoint"


class TestPresets:
    """--preset wiring (config.PRESETS): preset beats parser defaults,
    explicit flags beat the preset."""

    def _parse(self, argv):
        """Run superres_dwi's parser up to parse_args via a stub pipeline."""
        import argparse

        from mri_super_resolution_tpu.config import PRESETS, add_preset_arg

        p = argparse.ArgumentParser()
        p.add_argument("--epochs", type=int, default=2500)
        p.add_argument("--pn_epochs", type=int, default=10)
        p.add_argument("--inr_model", choices=("siren", "grid"),
                       default="siren")
        p.add_argument("--inr_restart_every", type=int, default=0)
        p.add_argument("--grid_lr", type=float, default=5e-3)
        p.add_argument("--grid_z_divisor", type=int, default=1)
        add_preset_arg(p, argv)
        assert set(PRESETS) == {"reference", "fast", "quality"}
        return p.parse_args(argv)

    def test_reference_is_default(self):
        args = self._parse([])
        assert args.inr_model == "siren" and args.epochs == 2500
        assert args.inr_restart_every == 0

    def test_quality_sets_grid_restart(self):
        args = self._parse(["--preset", "quality"])
        assert args.inr_model == "grid"
        assert args.inr_restart_every == 250
        assert args.grid_z_divisor == 1
        assert args.epochs == 2500  # quality keeps the reference schedule

    def test_fast_caps_epochs_no_pn(self):
        args = self._parse(["--preset", "fast"])
        assert args.inr_model == "grid"
        assert args.epochs == 600 and args.pn_epochs == 0

    def test_explicit_flag_beats_preset(self):
        args = self._parse(["--preset", "quality", "--inr_model", "siren",
                            "--epochs", "100"])
        assert args.inr_model == "siren" and args.epochs == 100
        assert args.inr_restart_every == 250  # untouched keys still preset

    def test_unknown_keys_filtered(self):
        """cohort_run has no grid dests — preset applies only known keys."""
        import argparse

        from mri_super_resolution_tpu.config import add_preset_arg

        p = argparse.ArgumentParser()
        p.add_argument("--steps", type=int, default=1000)
        p.add_argument("--inr_restart_every", type=int, default=0)
        add_preset_arg(p, ["--preset", "quality"])
        args = p.parse_args(["--preset", "quality"])
        assert args.inr_restart_every == 250
        assert not hasattr(args, "inr_model")
