"""Pallas fused SIREN kernel: parity with the flax reference (interpret mode
on CPU; same kernels compile for TPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mri_super_resolution_tpu.core.coords import mgrid
from mri_super_resolution_tpu.models import Siren
from mri_super_resolution_tpu.ops.pallas.siren_kernel import (
    siren_forward,
    siren_fused,
    weights_from_flax,
    weights_to_flax,
)


@pytest.fixture(scope="module")
def setup():
    model = Siren(hidden_features=128, hidden_layers=2)
    coords = mgrid((20, 20))  # 400 rows: exercises padding (not tile-aligned)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(400, 128)).astype(np.float32))
    params = model.init(jax.random.key(0), x)
    return model, params, x


class TestForwardParity:
    def test_matches_flax(self, setup):
        model, params, x = setup
        ref = model.apply(params, x)
        weights = weights_from_flax(params)
        out = siren_forward(x, weights)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)

    def test_roundtrip_weights(self, setup):
        model, params, x = setup
        weights = weights_from_flax(params)
        back = weights_to_flax(weights, params)
        ref = model.apply(back, x)
        out = siren_forward(x, weights)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


class TestVJPParity:
    def test_gradients_match(self, setup):
        model, params, x = setup
        weights = tuple(weights_from_flax(params))
        target = jnp.asarray(
            np.random.default_rng(1).normal(size=(400, 1)).astype(np.float32)
        )

        def loss_kernel(ws):
            return jnp.mean((siren_fused(x, ws, 30.0) - target) ** 2)

        def loss_ref(ws):
            p = weights_to_flax(list(ws), params)
            return jnp.mean((model.apply(p, x) - target) ** 2)

        g_kernel = jax.grad(loss_kernel)(weights)
        g_ref = jax.grad(loss_ref)(weights)
        for gk, gr in zip(g_kernel, g_ref):
            np.testing.assert_allclose(np.asarray(gk), np.asarray(gr), atol=5e-4)

    def test_input_gradient(self, setup):
        model, params, x = setup
        weights = tuple(weights_from_flax(params))

        def f_kernel(xx):
            return jnp.sum(siren_fused(xx, weights, 30.0))

        def f_ref(xx):
            return jnp.sum(model.apply(params, xx))

        gx_k = jax.grad(f_kernel)(x)
        gx_r = jax.grad(f_ref)(x)
        np.testing.assert_allclose(np.asarray(gx_k), np.asarray(gx_r), atol=5e-3)
