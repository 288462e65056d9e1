"""Model tests: shapes, init distributions, reference formula parity."""
import numpy as np
import jax
import jax.numpy as jnp

from mri_super_resolution_tpu.models import (
    Siren,
    SirenERD,
    SirenToy,
    PerturbNet,
    Wire,
    PIA,
    signal_model,
    synthetic_batch,
)


class TestSiren:
    def test_forward_shape(self):
        model = Siren(hidden_features=64, hidden_layers=2, out_features=1)
        params = model.init(jax.random.key(0), jnp.zeros((10, 2)))
        out = model.apply(params, jnp.zeros((10, 2)))
        assert out.shape == (10, 1)

    def test_init_ranges(self):
        """First layer U(-1/in, 1/in); hidden U(+-sqrt(6/in)/omega)."""
        model = Siren(hidden_features=256, hidden_layers=1)
        params = model.init(jax.random.key(1), jnp.zeros((1, 2)))
        flat = jax.tree_util.tree_leaves_with_path(params)
        kernels = {
            "/".join(str(p.key) for p in path if hasattr(p, "key")): leaf
            for path, leaf in flat
        }
        first = [v for k, v in kernels.items() if "SineLayer_0" in k and "kernel" in k][0]
        assert float(jnp.abs(first).max()) <= 1 / 2 + 1e-6
        hidden = [v for k, v in kernels.items() if "SineLayer_1" in k and "kernel" in k][0]
        bound = np.sqrt(6 / 256) / 30.0
        assert float(jnp.abs(hidden).max()) <= bound + 1e-6
        # uniform should nearly reach the bound
        assert float(jnp.abs(hidden).max()) >= 0.9 * bound

    def test_zero_input_nonzero_output(self):
        model = Siren(hidden_features=32, hidden_layers=1)
        params = model.init(jax.random.key(2), jnp.zeros((4, 2)))
        out = model.apply(params, jnp.zeros((4, 2)))
        assert float(jnp.abs(out).sum()) > 0  # biases propagate

    def test_can_overfit_tiny_image(self):
        """The de-facto 'does the INR learn' check (SURVEY.md section 4)."""
        import optax

        side = 16
        y, x = np.mgrid[0:side, 0:side] / side
        target = jnp.asarray(np.sin(4 * x) * np.cos(3 * y), dtype=jnp.float32).reshape(-1, 1)
        coords = jnp.asarray(
            np.stack(np.meshgrid(np.linspace(-1, 1, side), np.linspace(-1, 1, side), indexing="ij"), -1)
        ).reshape(-1, 2)
        model = Siren(hidden_features=64, hidden_layers=2)
        params = model.init(jax.random.key(0), coords)
        tx = optax.adam(1e-4)
        state = tx.init(params)

        @jax.jit
        def step(params, state):
            def loss_fn(p):
                return jnp.mean((model.apply(p, coords) - target) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, state = tx.update(grads, state)
            return optax.apply_updates(params, updates), state, loss

        for _ in range(300):
            params, state, loss = step(params, state)
        assert float(loss) < 1e-3


class TestVariants:
    def test_siren_erd_relu_output(self):
        model = SirenERD(hidden_features=32, hidden_layers=1)
        params = model.init(jax.random.key(0), jnp.zeros((6, 2)))
        out = model.apply(params, jnp.asarray(np.random.randn(6, 2), dtype=jnp.float32))
        assert out.shape == (6, 1)
        assert float(out.min()) >= 0.0  # ReLU output

    def test_siren_erd_perturb_changes_output(self):
        model = SirenERD(hidden_features=32, hidden_layers=1, perturb=True)
        coords = jnp.asarray(np.random.default_rng(0).normal(size=(6, 2)), dtype=jnp.float32)
        params = model.init(jax.random.key(0), coords, 1.0, 0.1)
        out0 = model.apply(params, coords, 0.0, 0.0)
        out1 = model.apply(params, coords, 3.0, 0.5)
        assert not np.allclose(np.asarray(out0), np.asarray(out1))

    def test_siren_toy(self):
        model = SirenToy(hidden_features=32, hidden_layers=1, perturb=True)
        coords = jnp.zeros((5, 2))
        params = model.init(jax.random.key(0), coords, 0.0, 4 / 720)
        out = model.apply(params, coords, 2.0, 4 / 720)
        assert out.shape == (5, 1)

    def test_perturbnet_bounded_by_eps(self):
        model = PerturbNet(hidden_features=16, dimension=3)
        coords = jnp.asarray(np.random.default_rng(1).normal(size=(7, 10)), dtype=jnp.float32)
        params = model.init(jax.random.key(0), coords, 0, 0.0)
        eps = 1 / 128
        out = model.apply(params, coords, 4, eps)
        assert out.shape == (7, 3)
        assert float(jnp.abs(out).max()) <= eps

    def test_perturbnet_zero_eps_is_zero(self):
        model = PerturbNet(hidden_features=16, dimension=2)
        coords = jnp.ones((3, 4))
        params = model.init(jax.random.key(0), coords, 0, 0.0)
        out = model.apply(params, coords, 1, 0.0)
        np.testing.assert_array_equal(np.asarray(out), 0.0)


class TestWire:
    def test_forward_real_output(self):
        model = Wire(hidden_features=32, hidden_layers=1)
        coords = jnp.asarray(np.random.default_rng(2).normal(size=(9, 2)), dtype=jnp.float32)
        params = model.init(jax.random.key(0), coords)
        out = model.apply(params, coords)
        assert out.shape == (9, 1)
        assert out.dtype == jnp.float32

    def test_matches_complex_formula(self):
        """One hidden Gabor layer on complex input == torch cfloat formula."""
        from mri_super_resolution_tpu.models.wire import ComplexGaborLayer

        rng = np.random.default_rng(3)
        zr = jnp.asarray(rng.normal(size=(5, 4)), dtype=jnp.float32)
        zi = jnp.asarray(rng.normal(size=(5, 4)), dtype=jnp.float32)
        layer = ComplexGaborLayer(6, omega_0=2.0, sigma_0=0.5)
        params = layer.init(jax.random.key(0), zr, zi)
        our_r, our_i = layer.apply(params, zr, zi)

        # rebuild with numpy complex arithmetic from the same params
        p = params["params"]
        z = np.asarray(zr) + 1j * np.asarray(zi)
        for name in ("linear", "scale_orth"):
            w = np.asarray(p[name]["kernel_r"]) + 1j * np.asarray(p[name]["kernel_i"])
            b = np.asarray(p[name]["bias_r"]) + 1j * np.asarray(p[name]["bias_i"])
            if name == "linear":
                lin = z @ w + b
            else:
                orth = z @ w + b
        freq = np.exp(1j * 2.0 * lin)
        gauss = np.exp(-0.25 * (np.abs(lin) ** 2 + np.abs(orth) ** 2))
        expected = freq * gauss
        np.testing.assert_allclose(np.asarray(our_r), expected.real, atol=1e-4)
        np.testing.assert_allclose(np.asarray(our_i), expected.imag, atol=1e-4)


class TestPIA:
    def test_forward_shapes(self):
        model = PIA()
        x = jnp.ones((8, 16))
        params = model.init(jax.random.key(0), x)
        sig, xin, D, T2, v = model.apply(params, x)
        assert sig.shape == (8, 16)
        assert D.shape == T2.shape == v.shape == (8, 3)

    def test_predictions_within_priors(self):
        model = PIA()
        x = jnp.asarray(np.random.default_rng(0).normal(size=(32, 16)) * 100, dtype=jnp.float32)
        params = model.init(jax.random.key(0), x)
        _, _, D, T2, v = model.apply(params, x)
        D, T2, v = np.asarray(D), np.asarray(T2), np.asarray(v)
        for c, (dm, dd) in enumerate(zip((0.5, 1.2, 2.85), (0.2, 0.5, 0.15))):
            assert (D[:, c] >= dm - dd - 1e-5).all() and (D[:, c] <= dm + dd + 1e-5).all()
        np.testing.assert_allclose(v.sum(-1), 1.0, rtol=1e-5)

    def test_signal_model_matches_reference_loop(self):
        rng = np.random.default_rng(4)
        D = rng.uniform(0.3, 3.0, (5, 3))
        T2 = rng.uniform(20, 1000, (5, 3))
        v = rng.dirichlet(np.ones(3), 5)
        ours = np.asarray(signal_model(jnp.asarray(D), jnp.asarray(T2), jnp.asarray(v)))
        b_values = [0, 150, 1000, 1500]
        te_values = [0, 13, 93, 143]
        expected = np.zeros((5, 16))
        for s in range(5):
            ctr = 0
            for b in b_values:
                for te in te_values:
                    expected[s, ctr] = 1000 * sum(
                        v[s, c] * np.exp(-b / 1000 * D[s, c]) * np.exp(-te / T2[s, c])
                        for c in range(3)
                    )
                    ctr += 1
        np.testing.assert_allclose(ours, expected, rtol=1e-4)

    def test_synthetic_batch(self):
        sig, D, T2, v, clean = synthetic_batch(jax.random.key(0), batch_size=12)
        assert sig.shape == (12, 16) and clean.shape == (12, 16)
        np.testing.assert_allclose(np.asarray(v).sum(-1), 1.0, rtol=1e-5)
