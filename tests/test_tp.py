"""Tensor-parallel fit: spec construction + 1-vs-8-device loss parity.

Runs on the virtual 8-device CPU mesh (conftest). The TP path is pure
sharding annotation — GSPMD inserts the collectives — so parity with a
single-device fit of identical inputs is the whole correctness story.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

from mri_super_resolution_tpu.core.coords import mgrid
from mri_super_resolution_tpu.models import Siren
from mri_super_resolution_tpu.parallel import (
    make_tp_fit,
    make_tp_mesh,
    siren_tp_specs,
)


def _setup(hidden_layers: int, hidden: int = 32):
    model = Siren(hidden_features=hidden, hidden_layers=hidden_layers,
                  out_features=1)
    coords = mgrid((16, 16))
    target = jnp.sin(3.0 * coords[:, :1]) * jnp.cos(2.0 * coords[:, 1:2])
    params = model.init(jax.random.key(0), coords)
    return model, params, coords, target


class TestSpecs:
    def test_alternating_and_final_parity_even_stack(self):
        # hidden_layers=3 -> 4 sine layers (even) -> final head replicated
        _, params, _, _ = _setup(3)
        specs = siren_tp_specs(params)["params"]
        assert specs["SineLayer_0"]["Dense_0"]["kernel"] == P(None, "model")
        assert specs["SineLayer_0"]["Dense_0"]["bias"] == P("model")
        assert specs["SineLayer_1"]["Dense_0"]["kernel"] == P("model", None)
        assert specs["SineLayer_1"]["Dense_0"]["bias"] == P()
        assert specs["SineLayer_2"]["Dense_0"]["kernel"] == P(None, "model")
        assert specs["SineLayer_3"]["Dense_0"]["kernel"] == P("model", None)
        assert specs["Dense_0"]["kernel"] == P()

    def test_final_row_parallel_odd_stack(self):
        # hidden_layers=2 -> 3 sine layers (odd) -> final head row-parallel
        _, params, _, _ = _setup(2)
        specs = siren_tp_specs(params)["params"]
        assert specs["SineLayer_2"]["Dense_0"]["kernel"] == P(None, "model")
        assert specs["Dense_0"]["kernel"] == P("model", None)

    def test_rejects_non_siren_tree(self):
        from mri_super_resolution_tpu.models import SirenERD

        model = SirenERD(hidden_features=16, hidden_layers=1)
        params = model.init(jax.random.key(0), mgrid((4, 4)))
        with pytest.raises(ValueError, match="plain Siren"):
            siren_tp_specs(params)

    def test_indivisible_width_raises(self):
        model, params, coords, target = _setup(2, hidden=30)  # 30 % 4 != 0
        mesh = make_tp_mesh(data=2, model=4)
        fit = make_tp_fit(model.apply, optax.adam(1e-4), mesh, 2,
                          siren_tp_specs(params))
        with pytest.raises(ValueError, match="not divisible"):
            fit(params, coords, target)


class TestParity:
    @pytest.mark.parametrize("hidden_layers", [2, 3])
    @pytest.mark.parametrize("data,model_ax", [(2, 4), (1, 8)])
    def test_loss_parity_vs_single_device(self, hidden_layers, data, model_ax):
        model, params, coords, target = _setup(hidden_layers)
        steps = 4

        mesh_n = make_tp_mesh(data=data, model=model_ax)
        fit_n = make_tp_fit(model.apply, optax.adam(1e-3), mesh_n, steps,
                            siren_tp_specs(params))
        res_n = fit_n(jax.tree.map(jnp.copy, params), coords, target)

        mesh_1 = make_tp_mesh(data=1, model=1,
                              devices=jax.devices()[:1])
        fit_1 = make_tp_fit(model.apply, optax.adam(1e-3), mesh_1, steps,
                            siren_tp_specs(params))
        res_1 = fit_1(params, coords, target)

        l_n = np.asarray(jax.device_get(res_n.losses))
        l_1 = np.asarray(jax.device_get(res_1.losses))
        np.testing.assert_allclose(l_n, l_1, rtol=1e-4, atol=1e-6)
        # params match too — looser: Adam's m/sqrt(v) at early steps amplifies
        # the shard-reduction-order float noise in the gradients
        for a, b in zip(jax.tree.leaves(res_n.params),
                        jax.tree.leaves(res_1.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=5e-5)

    def test_returned_params_reusable(self):
        """Continuation: feeding a returned (already-placed) tree back in
        must not consume it — the jit does not donate (review finding: with
        donation, device_put is a no-op on placed trees and the caller's
        buffers were silently deleted)."""
        model, params, coords, target = _setup(2)
        mesh = make_tp_mesh(data=2, model=4)
        fit = make_tp_fit(model.apply, optax.adam(1e-3), mesh, 2,
                          siren_tp_specs(params))
        res = fit(params, coords, target)
        res2 = fit(res.params, coords, target)
        # both trees still readable after the second call
        for leaf in jax.tree.leaves(res.params) + jax.tree.leaves(res2.params):
            np.asarray(leaf)

    def test_params_actually_sharded(self):
        model, params, coords, target = _setup(3)
        mesh = make_tp_mesh(data=2, model=4)
        fit = make_tp_fit(model.apply, optax.adam(1e-3), mesh, 2,
                          siren_tp_specs(params))
        res = fit(params, coords, target)
        k0 = res.params["params"]["SineLayer_0"]["Dense_0"]["kernel"]
        assert k0.sharding.spec == P(None, "model")
        # each device holds a quarter of the width
        shard_shapes = {s.data.shape for s in k0.addressable_shards}
        assert shard_shapes == {(k0.shape[0], k0.shape[1] // 4)}
