"""Serving-artifact roundtrips (jax.export).

Each test exports a fitted/initialized model, serializes to disk, loads it
back through the public ``serve.load`` path, and compares against the live
``model.apply`` — including at a batch size DIFFERENT from any used at
export time, which is the point of the symbolic batch dimension.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mri_super_resolution_tpu import serve
from mri_super_resolution_tpu.core.coords import fourier_encode, fourier_matrix
from mri_super_resolution_tpu.models import RAMS, Siren


class TestINRArtifact:
    def test_roundtrip_matches_live_apply(self, tmp_path):
        model = Siren(hidden_features=32, hidden_layers=2)
        coords0 = jnp.zeros((4, 2))
        B = fourier_matrix(jax.random.key(1), 8, 2)
        params = model.init(jax.random.key(0), fourier_encode(coords0, B))

        out = str(tmp_path / "inr_artifact")
        manifest = serve.export_inr(
            model.apply, params, coord_dim=2, out_dir=out,
            fourier_B=B, platforms=("cpu",), model_desc="siren 32x2 + FF8",
        )
        assert manifest["kind"] == "inr"
        assert manifest["fourier_features"] == [8, 2]

        served = serve.load(out)
        for n in (3, 57):  # two batch sizes — symbolic dim actually works
            coords = jax.random.uniform(jax.random.key(n), (n, 2), minval=-1)
            got = np.asarray(served(coords))
            want = np.asarray(model.apply(params, fourier_encode(coords, B)))
            assert got.shape == (n, 1)
            np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)

    def test_wire_roundtrip(self, tmp_path):
        from mri_super_resolution_tpu.models import Wire

        model = Wire(hidden_features=16, hidden_layers=1)
        params = model.init(jax.random.key(0), jnp.zeros((1, 2)))
        out = str(tmp_path / "wire")
        serve.export_inr(model.apply, params, 2, out, platforms=("cpu",))
        served = serve.load(out)
        coords = jax.random.uniform(jax.random.key(7), (21, 2), minval=-1.0)
        np.testing.assert_allclose(
            np.asarray(served(coords)),
            np.asarray(model.apply(params, coords)),
            atol=1e-6,
        )

    def test_no_fourier_path(self, tmp_path):
        model = Siren(hidden_features=16, hidden_layers=1)
        params = model.init(jax.random.key(0), jnp.zeros((1, 2)))
        out = str(tmp_path / "plain")
        serve.export_inr(model.apply, params, 2, out, platforms=("cpu",))
        served = serve.load(out)
        coords = jnp.linspace(-1, 1, 10).reshape(5, 2)
        np.testing.assert_allclose(
            np.asarray(served(coords)),
            np.asarray(model.apply(params, coords)),
            atol=1e-6,
        )


class TestGridINRArtifact:
    def test_roundtrip_matches_tensor_and_pointwise_paths(self, tmp_path):
        from mri_super_resolution_tpu.core.coords import mgrid
        from mri_super_resolution_tpu.models import GridINR
        from mri_super_resolution_tpu.models.grid_inr import (
            infer_tensor_grid_zbucket,
        )

        model = GridINR(num_levels=2, base_resolution=4, features_per_level=2,
                        hidden=8, z_divisor=1)
        nx, ny, nb = 6, 5, 4
        params = model.init(jax.random.key(0), jnp.zeros((1, 4)))

        out = str(tmp_path / "grid")
        manifest = serve.export_grid_inr(
            model, params, out, platforms=("cpu",), model_desc="grid 2x4x2")
        assert manifest["kind"] == "grid_inr"
        assert manifest["nb"] == nb

        served = serve.load(out)
        x = jnp.linspace(-1.0, 1.0, nx)
        y = jnp.linspace(-1.0, 1.0, ny)
        for nz in (3, 11):  # symbolic slice axis actually works
            z = jnp.linspace(-1.0, 1.0, nz)
            got = np.asarray(served(x, y, z))
            assert got.shape == (nx, ny, nz, nb, 1)
            # vs the pipeline's z-bucketed tensor inference (mgrid z planes)
            want = np.asarray(infer_tensor_grid_zbucket(
                model, params, (nx, ny, nz, nb), clamp_min=0.0,
            )).reshape(nx, ny, nz, nb, 1)
            np.testing.assert_allclose(got, want, atol=1e-6)
            # vs the pointwise flax apply on the same mgrid (ground truth)
            coords = mgrid((nx, ny, nz, nb))
            pw = np.clip(
                np.asarray(model.apply(params, coords)), 0.0, None
            ).reshape(nx, ny, nz, nb, 1)
            np.testing.assert_allclose(got, pw, atol=1e-5)

    def test_all_axes_symbolic_serves_lr_hr_and_2x_grids(self, tmp_path):
        """ONE artifact serves every grid density — the LR fit grid, the HR
        grid, and the 2x-in-plane recon grid of the reference's dense HR
        inference (superresDWI.py:161-162) — without re-export."""
        from mri_super_resolution_tpu.models import GridINR
        from mri_super_resolution_tpu.models.grid_inr import (
            grid_inr_tensor_apply,
        )

        model = GridINR(num_levels=2, base_resolution=4, features_per_level=2,
                        hidden=8, z_divisor=1)
        params = model.init(jax.random.key(0), jnp.zeros((1, 4)))
        out = str(tmp_path / "grid")
        serve.export_grid_inr(model, params, out,
                              platforms=("cpu",), clamp_min=None)
        served = serve.load(out)
        for shape in ((4, 4, 7, 4), (8, 8, 7, 4), (8, 6, 14, 4)):
            axes = [jnp.linspace(-1.0, 1.0, n) for n in shape[:3]]
            got = np.asarray(served(*axes))
            want = np.asarray(
                grid_inr_tensor_apply(model, params, shape)
            ).reshape(*shape, 1)
            np.testing.assert_allclose(got, want, atol=1e-6)


class TestRAMSArtifact:
    def test_roundtrip_matches_live_apply(self, tmp_path):
        model = RAMS(filters=4, N=1, r=2, channels=9)
        x0 = jnp.zeros((1, 12, 12, 9))
        params = model.init(jax.random.key(0), x0)

        out = str(tmp_path / "rams_artifact")
        manifest = serve.export_rams(
            model.apply, params, out, height=12, width=12,
            platforms=("cpu",), model_desc="tiny test rams",
        )
        assert manifest["kind"] == "rams"

        served = serve.load(out)
        for b in (1, 5):
            x = jax.random.uniform(jax.random.key(b), (b, 12, 12, 9)) * 1000
            got = np.asarray(served(x))
            want = np.asarray(model.apply(params, x))
            assert got.shape == (b, 36, 36, 1)
            # outputs are uint16-range (~1e4); the deserialized module is
            # AOT-compiled separately from the live jit, so bit-identity is
            # not guaranteed — 1e-5 relative is compile-variance level
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=0.1)


class TestPIAArtifact:
    def test_roundtrip_tuple_outputs_symbolic_batch(self, tmp_path):
        from mri_super_resolution_tpu.models.pia import PIA

        model = PIA(hidden_dims=(8, 16))
        sig0 = jnp.ones((1, 16)) * 1000.0
        params = model.init(jax.random.key(0), sig0)
        encode = lambda p, x: model.apply(p, x, method=PIA.encode)  # noqa: E731

        out = str(tmp_path / "pia_artifact")
        manifest = serve.export_pia(
            encode, params, out, platforms=("cpu",), model_desc="tiny pia")
        assert manifest["kind"] == "pia"

        served = serve.load(out)
        for n in (1, 7):
            sig = jax.random.uniform(jax.random.key(n), (n, 16)) * 1000.0
            got = served(sig)
            want = encode(params, sig)
            assert len(got) == 3
            for g, w in zip(got, want):
                assert np.asarray(g).shape == (n, 3)
                np.testing.assert_allclose(
                    np.asarray(g), np.asarray(w), rtol=1e-5, atol=1e-5)
        # physics invariants survive serialization: v is a softmax simplex
        v = np.asarray(got[2])
        np.testing.assert_allclose(v.sum(-1), 1.0, atol=1e-5)
        assert (v >= 0).all()


class TestManifest:
    def test_manifest_records_symbolic_shape_and_platforms(self, tmp_path):
        model = Siren(hidden_features=16, hidden_layers=1)
        params = model.init(jax.random.key(0), jnp.zeros((1, 2)))
        out = str(tmp_path / "m")
        m = serve.export_inr(model.apply, params, 2, out, platforms=("cpu",))
        assert m["platforms"] == ["cpu"]
        assert m["in_avals"][0]["shape"] == ["n", "2"]
        loaded = serve.load(out)
        assert loaded.manifest["jax_version"] == jax.__version__

    def test_load_missing_dir_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            serve.load(str(tmp_path / "nope"))
