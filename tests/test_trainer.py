"""MISR Trainer tests: fit loop, checkpoint save/restore, save-best-only."""
import numpy as np
import pytest

from mri_super_resolution_tpu.config import TrainerConfig, RAMSConfig
from mri_super_resolution_tpu.fit.trainer import Trainer
from mri_super_resolution_tpu.pipelines.misr import build_rams


def _tiny_data(rng, n=4, lr_size=8, scale=3, T=9):
    hr_size = lr_size * scale
    x = rng.uniform(7000, 8000, (n, lr_size, lr_size, T)).astype(np.float32)
    y = rng.uniform(7000, 8000, (n, hr_size, hr_size, 1)).astype(np.float32)
    m = np.ones_like(y)
    return x, y, m


@pytest.fixture(scope="module")
def tiny_model():
    return build_rams(RAMSConfig(filters=8, N=1, r=4))


class TestTrainer:
    def test_fit_and_checkpoint(self, tiny_model, tmp_path, rng):
        x, y, m = _tiny_data(rng)
        cfg = TrainerConfig(
            batch_size=2, epochs=2, evaluate_every=2, hr_size=24,
            checkpoint_dir=str(tmp_path / "ckpt"),
            log_dir=str(tmp_path / "logs"),
        )
        tr = Trainer(tiny_model, cfg)
        tr.init(x)
        state = tr.fit(x, (y, m), validation_data=(x, y, m))
        assert state.step == 2 * 2  # 2 epochs x 2 batches
        assert tr.manager.latest_step() is not None

        # restore into a fresh trainer
        tr2 = Trainer(tiny_model, cfg)
        st2 = tr2.init(x)
        assert st2.step == tr.manager.latest_step()

    def test_cosine_lr_schedule(self, tiny_model, tmp_path, rng):
        """cosine schedule trains (lr decays in-graph via the step count);
        decay_steps=0 with cosine is rejected at construction."""
        x, y, m = _tiny_data(rng)
        cfg = TrainerConfig(
            batch_size=2, epochs=1, evaluate_every=10, hr_size=24,
            lr_schedule="cosine", decay_steps=4,
            checkpoint_dir=str(tmp_path / "ckpt_cos"),
            log_dir=str(tmp_path / "logs_cos"),
        )
        tr = Trainer(tiny_model, cfg)
        tr.init(x)
        state = tr.fit(x, (y, m))
        assert state.step == 2
        with pytest.raises(ValueError, match="decay_steps"):
            Trainer(tiny_model, TrainerConfig(
                lr_schedule="cosine", checkpoint_dir=str(tmp_path / "c2"),
                log_dir=str(tmp_path / "l2")))
        with pytest.raises(ValueError, match="lr_schedule"):
            Trainer(tiny_model, TrainerConfig(
                lr_schedule="bogus", checkpoint_dir=str(tmp_path / "c3"),
                log_dir=str(tmp_path / "l3")))

    def test_restore_pre_flatten_opt_state_falls_back(self, tiny_model,
                                                      tmp_path, rng):
        """A checkpoint whose opt_state tree doesn't match the current
        optimizer (e.g. written before the optax.flatten migration) must
        restore params with reset moments, not crash: orbax rejects both a
        mismatched template AND a template that omits the on-disk subtree,
        so the fallback restores templateless."""
        x, y, m = _tiny_data(rng, n=2)
        cfg = TrainerConfig(
            batch_size=2, epochs=1, hr_size=24,
            checkpoint_dir=str(tmp_path / "ckpt3"),
            log_dir=str(tmp_path / "logs"),
        )
        tr = Trainer(tiny_model, cfg)
        tr.init(x)
        tr.fit(x, (y, m))
        step = tr.manager.latest_step()
        # rewrite the checkpoint with an alien opt_state structure
        tree = tr.manager.restore(step=step)
        tree["opt_state"] = {"legacy_per_leaf_adam": np.zeros(3, np.float32)}
        tr.manager.save(step + 1, tree, metric=1.0)

        tr2 = Trainer(tiny_model, cfg)
        st2 = tr2.init(x)  # must not raise
        # restores the step VALUE stored in the (rewritten) latest tree
        assert st2.step == step
        import jax

        assert len(jax.tree_util.tree_leaves(st2.params)) > 0

    def test_save_best_only_gates(self, tiny_model, tmp_path, rng):
        x, _, _ = _tiny_data(rng, n=2)
        cfg = TrainerConfig(
            batch_size=2, hr_size=24, checkpoint_dir=str(tmp_path / "ckpt2"),
            log_dir=str(tmp_path / "logs"), save_best_only=True,
        )
        tr = Trainer(tiny_model, cfg)
        tr.init(x)
        assert tr._save(10.0) is True
        tr.state.step += 1
        assert tr._save(5.0) is False  # worse PSNR skipped
        tr.state.step += 1
        assert tr._save(11.0) is True


class TestDataParallelTrainer:
    """Batch data parallelism over the virtual 8-device mesh: the sharded
    trainer must be numerically the SAME program as the single-device one
    (padded rows weighted out exactly), with XLA inserting the gradient
    all-reduce from the sharding annotations."""

    def _mesh(self):
        import jax
        from jax.sharding import Mesh

        return Mesh(np.array(jax.devices()), ("data",))

    def test_parity_with_unsharded(self, tiny_model, tmp_path, rng):
        import jax

        x, y, m = _tiny_data(rng, n=8)
        cfg = lambda tag: TrainerConfig(
            batch_size=8, epochs=2, evaluate_every=100, hr_size=24,
            checkpoint_dir=str(tmp_path / f"ckpt_{tag}"),
            log_dir=str(tmp_path / f"logs_{tag}"),
        )
        import jax.numpy as jnp

        tr1 = Trainer(tiny_model, cfg("single"))
        st1 = tr1.init(x, seed=0)
        tr8 = Trainer(tiny_model, cfg("mesh"), mesh=self._mesh())
        st8 = tr8.init(x, seed=0)

        # one explicit step from identical params: the forward reductions
        # (loss, psnr) must match tightly — proves the sharded program
        # computes the same math with the padding weighted out
        w = jnp.ones(len(x), jnp.float32)
        # _train_step DONATES its params/opt_state buffers — pass copies so
        # st1/st8 stay usable for the full fits below
        copy = lambda t: jax.tree.map(jnp.copy, t)
        p1, o1, loss1, psnr1 = tr1._train_step(
            copy(st1.params), copy(st1.opt_state), jnp.asarray(x),
            jnp.asarray(y), jnp.asarray(m), w)
        p8, o8, loss8, psnr8 = tr8._train_step(
            copy(st8.params), copy(st8.opt_state), jnp.asarray(x),
            jnp.asarray(y), jnp.asarray(m), w)
        np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-5)
        np.testing.assert_allclose(float(psnr1), float(psnr8), rtol=1e-5)
        # params after one Adam step: each coordinate moves at most ~lr, and
        # f32 reduction-order can flip near-zero gradient signs, so the bound
        # is absolute at the step scale (lr=1e-4 -> 2e-4 worst case), not
        # elementwise-tight
        for a, b in zip(jax.tree_util.tree_leaves(p1),
                        jax.tree_util.tree_leaves(p8)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=0, atol=2.1e-4)

        # functionally: full fits score the same
        s1 = tr1.fit(x, (y, m), seed=3)
        s8 = tr8.fit(x, (y, m), seed=3)
        tr1.state, tr8.state = s1, s8
        v1 = tr1.evaluate(x, y, m)
        v8 = tr8.evaluate(x, y, m)
        np.testing.assert_allclose(v1, v8, rtol=1e-3)

    def test_ragged_batch_padding_is_exact(self, tiny_model, tmp_path, rng):
        """n=5 on 8 devices: the padded samples must not change the
        evaluation at all."""
        x, y, m = _tiny_data(rng, n=5)
        cfg = lambda tag: TrainerConfig(
            batch_size=8, epochs=1, hr_size=24,
            checkpoint_dir=str(tmp_path / f"c_{tag}"),
            log_dir=str(tmp_path / f"l_{tag}"),
        )
        tr1 = Trainer(tiny_model, cfg("s"))
        tr1.init(x, seed=0)
        tr8 = Trainer(tiny_model, cfg("m"), mesh=self._mesh())
        tr8.init(x, seed=0)
        v1 = tr1.evaluate(x, y, m)
        v8 = tr8.evaluate(x, y, m)
        np.testing.assert_allclose(v1, v8, rtol=1e-5)


class TestPatientSplit:
    def test_holdout_is_disjoint_by_patient(self):
        import os
        import sys

        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "cli"))
        from train_misr import split_dataset

        rng = np.random.default_rng(0)
        n = 30
        pids = np.repeat(np.arange(3), 10)
        X = rng.normal(size=(n, 4, 4, 2)).astype(np.float32)
        Y = rng.normal(size=(n, 12, 12, 1)).astype(np.float32)
        M = np.ones_like(Y)
        (Xt, Yt, Mt), (Xv, Yv, Mv) = split_dataset(X, Y, M, pids,
                                                   holdout_patients=1)
        assert len(Xv) == 10 and len(Xt) == 20
        # val = exactly the last patient's patches; train = the rest
        np.testing.assert_array_equal(Xv, X[20:])
        np.testing.assert_array_equal(Xt, X[:20])

    def test_two_holdout_patients(self):
        import os
        import sys

        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "cli"))
        from train_misr import split_dataset

        pids = np.asarray([0, 0, 1, 2, 2, 1])
        X = np.arange(6, dtype=np.float32).reshape(6, 1, 1, 1)
        Y = X.copy()
        M = np.ones_like(Y)
        (Xt, _, _), (Xv, _, _) = split_dataset(X, Y, M, pids,
                                               holdout_patients=2)
        assert sorted(Xv.reshape(-1).tolist()) == [2.0, 3.0, 4.0, 5.0]
        assert sorted(Xt.reshape(-1).tolist()) == [0.0, 1.0]


class TestEMA:
    """cfg.ema_decay > 0: the trainer tracks ema = d*ema + (1-d)*params,
    validates/saves the averaged weights, and checkpoints roundtrip them."""

    def _cfg(self, tmp_path, tag, **kw):
        return TrainerConfig(
            batch_size=2, epochs=1, evaluate_every=2, hr_size=24,
            checkpoint_dir=str(tmp_path / f"ckpt_{tag}"),
            log_dir=str(tmp_path / f"logs_{tag}"), **kw)

    def test_ema_matches_closed_form(self, tiny_model, tmp_path, rng):
        """Run the EMA trainer and a plain trainer over the SAME batch order;
        the plain run's param trajectory folded through the EMA recursion
        must reproduce the EMA run's ema_params exactly."""
        import jax

        x, y, m = _tiny_data(rng)
        d = 0.5
        tr_p = Trainer(tiny_model, self._cfg(tmp_path, "plain"))
        tr_e = Trainer(tiny_model, self._cfg(tmp_path, "ema", ema_decay=d))
        st_p = tr_p.init(x, seed=0)
        st_e = tr_e.init(x, seed=0)
        # same seed => identical init; fold the plain trajectory manually
        expect = jax.tree.map(np.asarray, st_p.params)
        tr_p.fit(x, (y, m), seed=3)
        tr_e.fit(x, (y, m), seed=3)
        # replay: re-init and step the plain trainer capturing params
        tr_r = Trainer(tiny_model, self._cfg(tmp_path, "replay"))
        st_r = tr_r.init(x, seed=0)
        import jax.numpy as jnp
        key = jax.random.key(3 + 1)
        key, kperm, kaug = jax.random.split(key, 3)
        for idx in tr_r._batches(len(x), kperm):
            lr_b, hr_b, m_b, w = tr_r._pad_shard(x[idx], y[idx], m[idx])
            st_r.params, st_r.opt_state, _, _ = tr_r._train_step(
                st_r.params, st_r.opt_state, jnp.asarray(lr_b),
                jnp.asarray(hr_b), jnp.asarray(m_b), jnp.asarray(w))
            expect = jax.tree.map(
                lambda e, p: d * e + (1 - d) * np.asarray(p),
                expect, st_r.params)
        for e_got, e_want in zip(
            jax.tree.leaves(tr_e.state.ema_params), jax.tree.leaves(expect)
        ):
            np.testing.assert_allclose(
                np.asarray(e_got), e_want, rtol=2e-6, atol=2e-7)
        # and the raw param trajectories agree (EMA never feeds back)
        for p_got, p_want in zip(
            jax.tree.leaves(tr_e.state.params), jax.tree.leaves(st_r.params)
        ):
            np.testing.assert_allclose(
                np.asarray(p_got), np.asarray(p_want), rtol=2e-6, atol=2e-7)

    def test_checkpoint_roundtrip_and_unwrap(self, tiny_model, tmp_path, rng):
        import jax

        from mri_super_resolution_tpu.utils.checkpoint import (
            unwrap_trainer_params,
        )

        x, y, m = _tiny_data(rng)
        cfg = self._cfg(tmp_path, "rt", ema_decay=0.9)
        tr = Trainer(tiny_model, cfg)
        tr.init(x)
        tr.fit(x, (y, m), validation_data=(x, y, m))
        # fresh trainer restores ema_params
        tr2 = Trainer(tiny_model, cfg)
        st2 = tr2.init(x)
        assert st2.ema_params is not None
        for a, b in zip(jax.tree.leaves(st2.ema_params),
                        jax.tree.leaves(tr.state.ema_params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        # EMA diverged from raw params after training
        diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
                 for a, b in zip(jax.tree.leaves(st2.ema_params),
                                 jax.tree.leaves(st2.params))]
        assert max(diffs) > 0
        # unwrap prefers the averaged weights
        tree = tr2.manager.restore(step=tr2.manager.latest_step())
        served = unwrap_trainer_params(tree)
        for a, b in zip(jax.tree.leaves(served),
                        jax.tree.leaves(st2.ema_params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_enable_ema_on_plain_checkpoint_seeds_from_params(
            self, tiny_model, tmp_path, rng):
        import jax

        x, y, m = _tiny_data(rng)
        cfg0 = self._cfg(tmp_path, "seed0")
        tr = Trainer(tiny_model, cfg0)
        tr.init(x)
        tr.fit(x, (y, m), validation_data=(x, y, m))
        cfg1 = TrainerConfig(**{**cfg0.__dict__, "ema_decay": 0.9})
        tr2 = Trainer(tiny_model, cfg1)
        st = tr2.init(x)
        assert st.ema_params is not None
        for a, b in zip(jax.tree.leaves(st.ema_params),
                        jax.tree.leaves(st.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_bad_decay_rejected(self, tiny_model, tmp_path):
        with pytest.raises(ValueError, match="ema_decay"):
            Trainer(tiny_model, self._cfg(tmp_path, "bad", ema_decay=1.0))

    def test_mesh_ema_parity_with_single_device(self, tiny_model, tmp_path, rng):
        """EMA through the sharded step equals the single-device EMA."""
        import jax
        from jax.sharding import Mesh

        x, y, m = _tiny_data(rng, n=8)
        mesh = Mesh(np.array(jax.devices()), ("data",))
        cfg = lambda tag: TrainerConfig(
            batch_size=8, epochs=2, evaluate_every=100, hr_size=24,
            ema_decay=0.8,
            checkpoint_dir=str(tmp_path / f"ckpt_{tag}"),
            log_dir=str(tmp_path / f"logs_{tag}"))
        tr1 = Trainer(tiny_model, cfg("one"))
        trm = Trainer(tiny_model, cfg("mesh"), mesh=mesh)
        tr1.init(x, seed=0)
        trm.init(x, seed=0)
        tr1.fit(x, (y, m), seed=5)
        trm.fit(x, (y, m), seed=5)
        # absolute bound at the Adam-step scale (see
        # test_parity_with_unsharded): f32 reduction order across shards can
        # flip near-zero gradient signs, moving a coordinate by ~lr per step;
        # 4 steps at lr=1e-4 bounds the drift well under 1e-4
        for a, b in zip(jax.tree.leaves(tr1.state.ema_params),
                        jax.tree.leaves(trm.state.ema_params)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=0, atol=1e-4)


class TestGradAccum:
    """grad_accum=k micro-batches must be EXACTLY one big-batch optimizer
    step (weighted-sum accumulation; VERDICT r4 Next #3 — the route to
    effective batches past the B=128 single-shot VMEM cliff)."""

    def _cfg(self, tmp_path, tag, **kw):
        return TrainerConfig(
            epochs=1, evaluate_every=100, hr_size=24,
            checkpoint_dir=str(tmp_path / f"ckpt_{tag}"),
            log_dir=str(tmp_path / f"logs_{tag}"), **kw)

    def test_accum_matches_big_batch(self, tiny_model, tmp_path, rng):
        import jax

        x, y, m = _tiny_data(rng, n=8)
        big = Trainer(tiny_model, self._cfg(tmp_path, "big", batch_size=8))
        big.init(x, seed=0)
        sb = big.fit(x, (y, m), seed=3)

        acc = Trainer(tiny_model, self._cfg(
            tmp_path, "acc", batch_size=4, grad_accum=2))
        acc.init(x, seed=0)
        sa = acc.fit(x, (y, m), seed=3)

        # same permutation key + same total samples -> identical effective
        # batch; one optimizer step each
        assert sb.step == sa.step == 1
        for pb, pa in zip(jax.tree.leaves(sb.params),
                          jax.tree.leaves(sa.params)):
            np.testing.assert_allclose(
                np.asarray(pb), np.asarray(pa), rtol=2e-5, atol=2e-7)

    def test_accum_with_ragged_tail_and_ema(self, tiny_model, tmp_path, rng):
        """A partial final group (3 micro-batches, accum=2) still applies,
        and the EMA update happens once per effective step."""
        import jax

        x, y, m = _tiny_data(rng, n=6)
        tr = Trainer(tiny_model, self._cfg(
            tmp_path, "rag", batch_size=2, grad_accum=2, ema_decay=0.5))
        tr.init(x, seed=0)
        st = tr.fit(x, (y, m), seed=3)
        # 3 micro-batches -> groups of (2, 1) -> 2 optimizer steps
        assert st.step == 2
        assert st.ema_params is not None
        for e, p in zip(jax.tree.leaves(st.ema_params),
                        jax.tree.leaves(st.params)):
            assert np.isfinite(np.asarray(e)).all()
            assert np.isfinite(np.asarray(p)).all()

    def test_mesh_grad_accum_matches_unsharded_accum(self, tiny_model,
                                                     tmp_path, rng):
        """grad_accum over the 8-device mesh must be the same program as
        unsharded grad_accum (micro grads all-reduced, apply replicated)."""
        import jax

        x, y, m = _tiny_data(rng, n=8)
        mk = lambda tag, mesh: Trainer(tiny_model, self._cfg(
            tmp_path, tag, batch_size=4, grad_accum=2), mesh=mesh)
        t1 = mk("acc1", None)
        t1.init(x, seed=0)
        s1 = t1.fit(x, (y, m), seed=3)
        from jax.sharding import Mesh

        t8 = mk("acc8", Mesh(np.array(jax.devices()), ("data",)))
        t8.init(x, seed=0)
        s8 = t8.fit(x, (y, m), seed=3)
        assert s1.step == s8.step == 1
        for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                        jax.tree_util.tree_leaves(s8.params)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=0, atol=2.1e-4)
