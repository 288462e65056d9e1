"""MISR Trainer: checkpointed RAMS training with shift-tolerant loss.

Reference: multi-image-super-resolution/utils/training.py:29-220 — a Keras
Progbar loop with @tf.function train/test steps, tf.train.Checkpoint(step,
psnr, optimizer, model) + CheckpointManager(max_to_keep=3), TensorBoard
scalars, save-best-only on validation PSNR, optional flip/rot augmentation.

TPU-native differences:
- train/test steps are jitted pure functions over an explicit TrainState;
- checkpoints via utils.checkpoint.CheckpointManager (orbax) storing
  {step, psnr, params, opt_state};
- data pipeline is device-side batching of host numpy with PRNG-keyed
  shuffling (tf.data replaced by simple epoch permutation — the dataset fits
  in memory, matching the reference's from_tensor_slices usage);
- augmentation actually applies (the reference's ``.map`` results were
  discarded — training.py:119-121 — a quirk NOT replicated: the flag now
  works; pass data_aug=False for reference-equivalent behaviour);
- scalar logs go to CSV (TensorBoard-compatible writers optional).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mri_super_resolution_tpu.config import TrainerConfig
from mri_super_resolution_tpu.ops.shift_metrics import shift_l1_loss, shift_psnr
from mri_super_resolution_tpu.utils.checkpoint import CheckpointManager
from mri_super_resolution_tpu.utils.tbevents import EventWriter

Array = jax.Array


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: int = 0
    # exponential moving average of params (None unless cfg.ema_decay > 0).
    # When present, validation / best-checkpoint gating / serving use THESE
    # weights; ``params`` stays the raw optimizer trajectory for resume.
    ema_params: Any = None


def _augment_batch(key, lr, hr, mask):
    """Random flip + rot90 applied consistently to LR/HR/mask
    (training.py:14-27)."""
    kf, kr = jax.random.split(key)
    flip = jax.random.uniform(kf) < 0.5
    k = jax.random.randint(kr, (), 0, 4)

    def do_flip(x):
        return jnp.where(flip, x[:, :, ::-1], x)

    def do_rot(x):
        return jax.lax.switch(k, [lambda a: a] + [
            (lambda n: lambda a: jnp.rot90(a, n, axes=(1, 2)))(n) for n in (1, 2, 3)
        ], x)

    return tuple(do_rot(do_flip(x)) for x in (lr, hr, mask))


class Trainer:
    """Train a RAMS-style model with shift-tolerant L1 and cPSNR tracking."""

    def __init__(
        self,
        model,
        cfg: TrainerConfig,
        loss_fn: Callable = shift_l1_loss,
        metric_fn: Callable = shift_psnr,
        name: str = "RAMS",
        mesh: "jax.sharding.Mesh | None" = None,
    ):
        """``mesh``: optional device mesh for batch data parallelism. The
        patch batch shards along the mesh's first axis (params replicated;
        XLA inserts the gradient all-reduce from the sharding annotations —
        the TPU-native replacement for the tf.distribute layer the reference
        never had). Ragged batches are padded to the device count and the
        padding removed from loss/metric exactly via per-sample weights
        (``shift_l1_loss`` is per-image; ``shift_psnr(reduce=False)``)."""
        self.model = model
        self.cfg = cfg
        self.loss_fn = loss_fn
        self.metric_fn = metric_fn
        self.name = name
        self.mesh = mesh
        # flatten: RAMS has 284 tiny param leaves; per-leaf Adam emitted ~530
        # (32,)-sized copies per step on TPU (~0.6 ms of pure dispatch).
        # Flattening runs one fused update over a single concatenated vector
        # — numerically identical for elementwise transforms like adam.
        if cfg.lr_schedule == "cosine":
            if cfg.decay_steps <= 0:
                raise ValueError("lr_schedule='cosine' needs decay_steps > 0")
            lr = optax.cosine_decay_schedule(cfg.learning_rate, cfg.decay_steps)
        elif cfg.lr_schedule == "constant":
            lr = cfg.learning_rate
        else:
            raise ValueError(f"unknown lr_schedule {cfg.lr_schedule!r}")
        self.tx = optax.flatten(optax.adam(lr))
        if not 0.0 <= cfg.ema_decay < 1.0:
            raise ValueError(f"ema_decay must be in [0, 1), got {cfg.ema_decay}")
        self._ema = cfg.ema_decay > 0.0
        self.manager = CheckpointManager(cfg.checkpoint_dir, cfg.max_to_keep)
        self.state: TrainState | None = None
        self.log_rows: list[tuple] = []
        self._last_val_loss = 0.0
        # TensorBoard-parity writers (training.py:128-129): train_<name> and
        # test_<name> run dirs under log_dir, tags 'Loss'/'PSNR'. CSV stays
        # the default; these are additive when cfg.tensorboard is set.
        self._tb_train: EventWriter | None = None
        self._tb_test: EventWriter | None = None
        if cfg.tensorboard:
            self._tb_train = EventWriter(os.path.join(cfg.log_dir, f"train_{name}"))
            self._tb_test = EventWriter(os.path.join(cfg.log_dir, f"test_{name}"))

        hr = cfg.hr_size

        # ONE weighted step serves both the single-device and the mesh path:
        # with w = ones, sum(per*w)/sum(w) IS the batch mean the reference
        # computes; on a mesh, padded samples carry w=0 and drop out of loss,
        # gradient, and metric exactly. (metric_fn must accept reduce=False
        # and return per-image values — shift_psnr does.)
        def train_fn(params, opt_state, lr_batch, hr_batch, mask_batch, w):
            def loss_of(p):
                sr = self.model.apply(p, lr_batch.astype(jnp.float32))
                per = self.loss_fn(hr_batch, sr, mask_batch, hr)  # (B,)
                return jnp.sum(per * w) / jnp.sum(w), sr

            (loss, sr), grads = jax.value_and_grad(loss_of, has_aux=True)(params)
            updates, new_opt = self.tx.update(grads, opt_state)
            new_params = optax.apply_updates(params, updates)
            # in-graph failure guard: a NaN/inf batch must not poison the
            # params (the INR side's analog is the restart-on-collapse guard,
            # INR_ERD.py:211-217). Deciding here (not in host Python) keeps
            # the old state reachable even though the input buffers are
            # DONATED below — the fit loop only logs the skip.
            ok = jnp.isfinite(loss)
            keep = lambda old, new: jax.tree.map(
                lambda a, b: jnp.where(ok, b, a), old, new)
            params = keep(params, new_params)
            opt_state = keep(opt_state, new_opt)
            per_psnr = self.metric_fn(hr_batch, sr, mask_batch, hr, reduce=False)
            psnr = jnp.sum(per_psnr * w) / jnp.sum(w)
            return params, opt_state, loss, psnr

        ema_d = cfg.ema_decay

        def train_fn_ema(params, opt_state, ema, lr_batch, hr_batch,
                         mask_batch, w):
            params, opt_state, loss, psnr = train_fn(
                params, opt_state, lr_batch, hr_batch, mask_batch, w)
            # on a non-finite batch ``params`` kept its old values (in-graph
            # guard above), so the EMA moves toward the unchanged weights —
            # a slight no-op pull, never toward poisoned ones
            ema = jax.tree.map(
                lambda e, p: ema_d * e + (1.0 - ema_d) * p, ema, params)
            return params, opt_state, ema, loss, psnr

        def test_fn(params, lr_batch, hr_batch, mask_batch, w):
            sr = self.model.apply(params, lr_batch.astype(jnp.float32))
            per = self.loss_fn(hr_batch, sr, mask_batch, hr)
            loss = jnp.sum(per * w) / jnp.sum(w)
            per_psnr = self.metric_fn(hr_batch, sr, mask_batch, hr, reduce=False)
            psnr = jnp.sum(per_psnr * w) / jnp.sum(w)
            return loss, psnr

        # ---- gradient accumulation (cfg.grad_accum > 1) ----------------
        # Micro-batches contribute WEIGHTED SUMS (sum(per*w) and its grad,
        # sum(w)); the apply step divides once. That makes k accumulated
        # micro-batches bit-equivalent in expectation to one optimizer step
        # on the concatenated batch — including ragged tails, whose padded
        # samples carry w=0 (reference semantics: one tf.function step per
        # batch, utils/training.py:131-156; accumulation is the TPU-native
        # route to effective batches past the single-shot VMEM cliff).
        def micro_fn(params, lr_batch, hr_batch, mask_batch, w):
            def loss_of(p):
                sr = self.model.apply(p, lr_batch.astype(jnp.float32))
                per = self.loss_fn(hr_batch, sr, mask_batch, hr)
                return jnp.sum(per * w), sr

            (loss_sum, sr), grads = jax.value_and_grad(
                loss_of, has_aux=True)(params)
            per_psnr = self.metric_fn(hr_batch, sr, mask_batch, hr,
                                      reduce=False)
            return grads, loss_sum, jnp.sum(per_psnr * w), jnp.sum(w)

        def accum_fn(acc, delta):
            return jax.tree.map(jnp.add, acc, delta)

        def apply_fn(params, opt_state, grads_sum, loss_sum, psnr_sum, wsum):
            grads = jax.tree.map(lambda g: g / wsum, grads_sum)
            loss = loss_sum / wsum
            updates, new_opt = self.tx.update(grads, opt_state)
            new_params = optax.apply_updates(params, updates)
            # same in-graph non-finite guard as the fused step: one poisoned
            # micro-batch poisons the accumulated sums, so the whole
            # effective step is skipped
            ok = jnp.isfinite(loss)
            keep = lambda old, new: jax.tree.map(
                lambda a, b: jnp.where(ok, b, a), old, new)
            return (keep(params, new_params), keep(opt_state, new_opt),
                    loss, psnr_sum / wsum)

        def apply_fn_ema(params, opt_state, ema, grads_sum, loss_sum,
                         psnr_sum, wsum):
            params, opt_state, loss, psnr = apply_fn(
                params, opt_state, grads_sum, loss_sum, psnr_sum, wsum)
            ema = jax.tree.map(
                lambda e, p: ema_d * e + (1.0 - ema_d) * p, ema, params)
            return params, opt_state, ema, loss, psnr

        # state args leading the step signature: params, opt_state[, ema]
        n_state = 3 if self._ema else 2
        step_fn = train_fn_ema if self._ema else train_fn
        apply_step = apply_fn_ema if self._ema else apply_fn
        self._accum = max(1, int(cfg.grad_accum))
        if mesh is None:
            self._n_shard = 1
            # donate the state trees: the updated trees alias the inputs'
            # HBM instead of allocating fresh buffers every step (safe —
            # every caller reassigns from the return value, and the NaN
            # guard is in-graph)
            self._train_step = jax.jit(
                step_fn, donate_argnums=tuple(range(n_state)))
            self._test_step = jax.jit(test_fn)
            if self._accum > 1:
                self._micro_step = jax.jit(micro_fn)
                # accumulator tree is donated: accumulation is in-place HBM
                self._accum_step = jax.jit(accum_fn, donate_argnums=(0,))
                # grads_sum is NOT donated: optax.flatten consumes it in a
                # different (concatenated) layout, so donation would only
                # emit "unusable donated buffer" warnings
                self._apply_step = jax.jit(
                    apply_step, donate_argnums=tuple(range(n_state)))
        else:
            from jax.sharding import NamedSharding, PartitionSpec

            axis = mesh.axis_names[0]
            repl = NamedSharding(mesh, PartitionSpec())
            bsh = NamedSharding(mesh, PartitionSpec(axis))
            self._n_shard = mesh.devices.size
            self._train_step = jax.jit(
                step_fn,
                in_shardings=((repl,) * n_state + (bsh,) * 4),
                out_shardings=(repl,) * (n_state + 2),
                donate_argnums=tuple(range(n_state)),
            )
            self._test_step = jax.jit(
                test_fn,
                in_shardings=((repl,) + (bsh,) * 4),
                out_shardings=(repl, repl),
            )
            if self._accum > 1:
                self._micro_step = jax.jit(
                    micro_fn,
                    in_shardings=((repl,) + (bsh,) * 4),
                    out_shardings=(repl, repl, repl, repl),
                )
                self._accum_step = jax.jit(
                    accum_fn, donate_argnums=(0,),
                    out_shardings=(repl, repl, repl, repl))
                self._apply_step = jax.jit(
                    apply_step,
                    in_shardings=(repl,) * (n_state + 4),
                    out_shardings=(repl,) * (n_state + 2),
                    donate_argnums=tuple(range(n_state)),
                )

    def _pad_shard(self, *arrays):
        """Pad a ragged batch to a device-count multiple; returns the padded
        arrays plus the 0/1 sample-weight vector that removes the padding
        from every reduction exactly. With one shard this is a no-op plus
        an all-ones weight vector."""
        b = arrays[0].shape[0]
        n = self._n_shard
        pad = (-b) % n
        w = np.ones(b + pad, np.float32)
        if pad:
            arrays = tuple(
                np.concatenate([a, np.repeat(a[:1], pad, axis=0)]) for a in arrays
            )
            w[b:] = 0.0
        return (*arrays, w)

    # ------------------------------------------------------------------
    def init(self, sample_lr: np.ndarray, seed: int = 0) -> TrainState:
        params = self.model.init(jax.random.key(seed), jnp.asarray(sample_lr[:1], jnp.float32))
        ema = None
        if self._ema:
            # distinct buffers, NOT aliases of params: both trees are donated
            # to _train_step, and donating the same buffer twice is invalid
            ema = jax.tree.map(lambda p: jnp.array(p, copy=True), params)
        state = TrainState(params, self.tx.init(params), 0, ema)
        restored = self.restore(state)
        self.state = restored or state
        return self.state

    def restore(self, template: TrainState) -> TrainState | None:
        latest = self.manager.latest_step()
        if latest is None:
            return None
        tmpl = {"params": template.params, "opt_state": template.opt_state,
                "step": 0, "psnr": 0.0}
        if self._ema:
            tmpl["ema_params"] = template.ema_params
        try:
            tree = self.manager.restore(tmpl, step=latest)
            opt_state = tree["opt_state"]
        except (ValueError, KeyError):
            # template/checkpoint layout mismatch (pre-flatten per-leaf adam
            # state, or an ema_params subtree on exactly one side): keep the
            # trained params, restart optimizer moments. Restore templateless
            # — orbax rejects a template that omits an on-disk subtree, so a
            # partial template cannot work.
            tree = self.manager.restore(step=latest)
            opt_state = template.opt_state
            print("checkpoint layout differs from this config's template; "
                  "params restored, optimizer moments reset")
        ema = None
        if self._ema:
            # resuming an EMA run restores its EMA; enabling EMA on a non-EMA
            # checkpoint seeds the average at the restored params
            restored_ema = tree.get("ema_params")
            ema = jax.tree.map(
                lambda p: jnp.array(p, copy=True),
                restored_ema if restored_ema is not None else tree["params"])
        print(f"Model restored from checkpoint at step {tree['step']}.")
        return TrainState(tree["params"], opt_state, int(tree["step"]), ema)

    def _save(self, psnr: float) -> bool:
        tree = {
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "step": self.state.step,
            "psnr": float(psnr),
        }
        if self._ema:
            tree["ema_params"] = self.state.ema_params
        return self.manager.save(
            self.state.step, tree,
            metric=float(psnr),
            best_only=self.cfg.save_best_only,
        )

    # ------------------------------------------------------------------
    def _batches(self, n: int, key) -> Iterator[np.ndarray]:
        """Shuffled batches INCLUDING the ragged remainder (the reference's
        tf.data .batch() keeps it, training.py:119; and a dataset smaller
        than batch_size must yield one batch, not zero). The remainder shape
        costs one extra jit executable, compiled once and reused."""
        perm = np.asarray(jax.random.permutation(key, n))
        bs = self.cfg.batch_size
        for i in range(0, n, bs):
            yield perm[i : i + bs]

    def fit(
        self,
        x: np.ndarray,  # (N, h, w, T) LR stacks
        y: tuple[np.ndarray, np.ndarray],  # (HR, HR_mask)
        validation_data: tuple | None = None,
        epochs: int | None = None,
        seed: int = 0,
    ) -> TrainState:
        cfg = self.cfg
        epochs = epochs or cfg.epochs
        hr_imgs, hr_masks = y
        state = self.state or self.init(x, seed)
        key = jax.random.key(seed + 1)

        accum = self._accum

        def device_batch(idx, kaug):
            lr_np, hr_np, m_np, w = self._pad_shard(
                x[idx], hr_imgs[idx], hr_masks[idx])
            lr_b = jnp.asarray(lr_np)
            hr_b = jnp.asarray(hr_np)
            m_b = jnp.asarray(m_np)
            if cfg.data_aug:
                kaug, k = jax.random.split(kaug)
                lr_b, hr_b, m_b = _augment_batch(k, lr_b, hr_b, m_b)
            return lr_b, hr_b, m_b, jnp.asarray(w), kaug

        for epoch in range(epochs):
            key, kperm, kaug = jax.random.split(key, 3)
            train_loss = []
            train_psnr = []
            idx_iter = iter(list(self._batches(len(x), kperm)))
            groups = []
            chunk = []
            for idx in idx_iter:
                chunk.append(idx)
                if len(chunk) == accum:
                    groups.append(chunk)
                    chunk = []
            if chunk:
                groups.append(chunk)  # partial tail group — exact via wsum
            for group in groups:
                if accum == 1:
                    lr_b, hr_b, m_b, w_b, kaug = device_batch(group[0], kaug)
                    if self._ema:
                        (new_params, new_opt, new_ema, loss, psnr) = \
                            self._train_step(
                                state.params, state.opt_state,
                                state.ema_params, lr_b, hr_b, m_b, w_b)
                        state.ema_params = new_ema
                    else:
                        new_params, new_opt, loss, psnr = self._train_step(
                            state.params, state.opt_state, lr_b, hr_b, m_b,
                            w_b)
                else:
                    acc = None
                    for idx in group:
                        lr_b, hr_b, m_b, w_b, kaug = device_batch(idx, kaug)
                        delta = self._micro_step(
                            state.params, lr_b, hr_b, m_b, w_b)
                        acc = delta if acc is None else self._accum_step(
                            acc, delta)
                    if self._ema:
                        (new_params, new_opt, new_ema, loss, psnr) = \
                            self._apply_step(state.params, state.opt_state,
                                             state.ema_params, *acc)
                        state.ema_params = new_ema
                    else:
                        new_params, new_opt, loss, psnr = self._apply_step(
                            state.params, state.opt_state, *acc)
                # always adopt the returned trees (the inputs were donated);
                # on a non-finite batch the step itself kept the old values
                state.params, state.opt_state = new_params, new_opt
                loss_f = float(loss)
                if not np.isfinite(loss_f):
                    print(f"step {state.step}: non-finite loss, batch skipped")
                    continue
                state.step += 1
                train_loss.append(loss_f)
                train_psnr.append(float(psnr))
                if self._tb_train is not None:
                    # running-epoch means, matching tf.keras.metrics.Mean
                    # semantics at training.py:157-162
                    self._tb_train.add_scalar("Loss", float(np.mean(train_loss)), state.step)
                    self._tb_train.add_scalar("PSNR", float(np.mean(train_psnr)), state.step)

                if validation_data is not None and state.step % cfg.evaluate_every == 0:
                    val_psnr = self.evaluate(*validation_data)
                    self.log_rows.append(
                        (state.step, np.mean(train_loss), np.mean(train_psnr), val_psnr)
                    )
                    if self._tb_test is not None:
                        self._tb_test.add_scalar("Loss", self._last_val_loss, state.step)
                        self._tb_test.add_scalar("PSNR", val_psnr, state.step)
                        self._tb_train.flush()
                        self._tb_test.flush()
                    self.state = state
                    self._save(val_psnr)
            print(
                f"Epoch {epoch + 1}/{epochs}: loss {np.mean(train_loss):.2f} "
                f"PSNR {np.mean(train_psnr):.2f}"
            )
        self.state = state
        if validation_data is None:
            self._save(float(np.mean(train_psnr)) if train_psnr else 0.0)
        self._flush_logs()
        return state

    def _flush_logs(self) -> None:
        """Persist scalar logs (the TensorBoard-scalars analog,
        training.py:128-129,157-178) as CSV under log_dir."""
        if self._tb_train is not None:
            self._tb_train.flush()
            self._tb_test.flush()
        if not self.log_rows:
            return
        os.makedirs(self.cfg.log_dir, exist_ok=True)
        path = os.path.join(self.cfg.log_dir, f"{self.name}_scalars.csv")
        new = not os.path.exists(path)
        with open(path, "a") as f:
            if new:
                f.write("step,train_loss,train_psnr,val_psnr\n")
            for row in self.log_rows:
                f.write(",".join(str(x) for x in row) + "\n")
        self.log_rows.clear()

    def evaluate(self, x_val, y_val, mask_val, params=None) -> float:
        """Sample-weighted val metrics over ALL samples (the ragged last
        batch included — a val set smaller than batch_size previously
        produced zero batches and a bogus 0.0 PSNR that poisoned best-only
        checkpoint gating). With EMA enabled the averaged weights are
        evaluated (they are what the checkpoint serves); pass ``params``
        to override."""
        if params is None:
            params = (self.state.ema_params
                      if self._ema else self.state.params)
        losses, psnrs, weights = [], [], []
        bs = self.cfg.batch_size
        for i in range(0, len(x_val), bs):
            *batch, w = self._pad_shard(
                x_val[i : i + bs], y_val[i : i + bs], mask_val[i : i + bs])
            loss, psnr = self._test_step(
                params, *(jnp.asarray(a) for a in batch),
                jnp.asarray(w)
            )
            losses.append(float(loss))
            psnrs.append(float(psnr))
            weights.append(len(x_val[i : i + bs]))
        if not losses:
            raise ValueError("evaluate() called with an empty validation set")
        self._last_val_loss = float(np.average(losses, weights=weights))
        return float(np.average(psnrs, weights=weights))
