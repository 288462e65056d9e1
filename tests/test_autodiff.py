"""Differential operators vs closed forms."""
import numpy as np
import jax.numpy as jnp

from mri_super_resolution_tpu.core.autodiff import gradient, divergence, laplace


def quadratic(x):
    # f(x, y) = x^2 + 3 y^2 ; grad = (2x, 6y); laplacian = 8
    return (x[..., 0] ** 2 + 3.0 * x[..., 1] ** 2)[..., None]


def vector_field(x):
    # v(x, y) = (2x, 5y); div = 7
    return jnp.stack([2.0 * x[..., 0], 5.0 * x[..., 1]], axis=-1)


class TestOperators:
    def setup_method(self):
        rng = np.random.default_rng(0)
        self.coords = jnp.asarray(rng.normal(size=(10, 2)).astype(np.float32))

    def test_gradient(self):
        g = gradient(quadratic, self.coords)
        expected = np.stack(
            [2 * np.asarray(self.coords[:, 0]), 6 * np.asarray(self.coords[:, 1])], -1
        )
        np.testing.assert_allclose(np.asarray(g), expected, rtol=1e-5)

    def test_divergence(self):
        d = divergence(vector_field, self.coords)
        np.testing.assert_allclose(np.asarray(d), 7.0, rtol=1e-6)

    def test_laplace(self):
        l = laplace(quadratic, self.coords)
        np.testing.assert_allclose(np.asarray(l), 8.0, rtol=1e-5)

    def test_on_siren(self):
        """Operators compose with a real INR (smoke)."""
        import jax
        from mri_super_resolution_tpu.models import Siren

        model = Siren(hidden_features=16, hidden_layers=1)
        params = model.init(jax.random.key(0), self.coords)
        f = lambda c: model.apply(params, c)
        g = gradient(f, self.coords)
        l = laplace(f, self.coords)
        assert g.shape == (10, 2) and l.shape == (10,)
        assert np.isfinite(np.asarray(g)).all()
