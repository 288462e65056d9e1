"""Parity tests for the experimental RFAB Pallas conv (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mri_super_resolution_tpu.ops.pallas.conv3d_kernel import conv3d_same_rfab


def _xla_conv(x, kernel, bias, padding="SAME"):
    """The WNConv forward this kernel replaces (models/rams.py:128-133)."""
    dn = jax.lax.conv_dimension_numbers(
        x.shape, kernel.shape, ("NDHWC", "DHWIO", "NDHWC"))
    out = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1, 1), padding=padding,
        dimension_numbers=dn)
    return out + bias


@pytest.mark.parametrize("shape", [
    (2, 8, 8, 5, 32),   # small RFAB-like
    (1, 9, 7, 4, 32),   # H != W, short T
])
def test_matches_xla_conv(shape, rng):
    B, H, W, T, C = shape
    Cout = 32
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 3, C, Cout)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(Cout,)).astype(np.float32))
    ref = np.asarray(_xla_conv(x, k, b))
    out = np.asarray(conv3d_same_rfab(x, k, b, interpret=True))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_valid_padding_matches_xla(rng):
    """VALID variant (the temporal-reduction convs): forward + grads."""
    from mri_super_resolution_tpu.ops.pallas.conv3d_kernel import (
        conv3d_rfab, conv3d_rfab_trainable)

    B, H, W, T, C = 1, 7, 6, 4, 32
    x = jnp.asarray(rng.normal(size=(B, H, W, T, C)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 3, C, C)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))
    ref = np.asarray(_xla_conv(x, k, b, "VALID"))
    out = np.asarray(conv3d_rfab(x, k, b, "VALID", interpret=True))
    assert out.shape == ref.shape == (B, H - 2, W - 2, T - 2, C)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)

    t = jnp.asarray(rng.normal(size=ref.shape).astype(np.float32))

    def loss_k(x, k, b):
        return jnp.mean((conv3d_rfab_trainable(x, k, b, "VALID") - t) ** 2)

    def loss_r(x, k, b):
        return jnp.mean((_xla_conv(x, k, b, "VALID") - t) ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(x, k, b)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, k, b)
    for a_, b_, name in zip(gk, gr, ("dx", "dkernel", "dbias")):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_gradients_match_autodiff(rng):
    """custom-VJP (dx, dkernel, dbias) vs jax.grad through the XLA conv."""
    from mri_super_resolution_tpu.ops.pallas.conv3d_kernel import (
        conv3d_same_rfab_trainable)

    B, H, W, T, C = 1, 6, 5, 3, 32
    x = jnp.asarray(rng.normal(size=(B, H, W, T, C)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 3, C, C)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(B, H, W, T, C)).astype(np.float32))

    def loss_k(x, k, b):
        return jnp.mean((conv3d_same_rfab_trainable(x, k, b) - t) ** 2)

    def loss_r(x, k, b):
        return jnp.mean((_xla_conv(x, k, b) - t) ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(x, k, b)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, k, b)
    for a_, b_, name in zip(gk, gr, ("dx", "dkernel", "dbias")):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_rams_model_equivalence(rng):
    """RAMS(conv_kernel=True) must match the XLA path exactly: identical
    param tree (shapes unchanged) and matching forward at f32."""
    from mri_super_resolution_tpu.config import RAMSConfig
    from mri_super_resolution_tpu.pipelines.misr import build_rams

    cfg = dict(scale=3, filters=32, channels=9, r=8, N=1,
               compute_dtype="float32")
    a = build_rams(RAMSConfig(**cfg))
    b = build_rams(RAMSConfig(conv_kernel=True, **cfg))
    x = jnp.asarray(rng.uniform(1000, 9000, size=(1, 8, 8, 9)).astype(np.float32))
    pa = a.init(jax.random.key(0), x)
    pb = b.init(jax.random.key(0), x)
    assert jax.tree_util.tree_structure(pa) == jax.tree_util.tree_structure(pb)
    oa = np.asarray(a.apply(pa, x))
    ob = np.asarray(b.apply(pb, x))
    np.testing.assert_allclose(ob, oa, rtol=2e-4, atol=2e-2)


def test_bf16_activations(rng):
    B, H, W, T, C = 1, 8, 8, 3, 32
    x = jnp.asarray(rng.normal(size=(B, H, W, T, C)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 3, C, C)).astype(np.float32) * 0.1)
    b = jnp.zeros((C,), jnp.float32)
    ref = np.asarray(_xla_conv(x, k, b))
    out = np.asarray(conv3d_same_rfab(
        x.astype(jnp.bfloat16), k, b, interpret=True,
        compute_dtype=jnp.bfloat16)).astype(np.float32)
    # bf16 operands, f32 accumulation: ~1e-2 relative agreement
    np.testing.assert_allclose(out, ref, rtol=0.05, atol=0.05)
