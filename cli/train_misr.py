#!/usr/bin/env python
"""Train the RAMS multi-image SR network on DWI acquisitions.

The reference ships the Trainer class (multi-image-super-resolution/utils/
training.py) but no training driver (it was run from an undistributed
notebook against the PROBA-V dataset). This CLI builds a DWI training set —
HR patches from the mean-b0 volumes, LR stacks of shifted noisy synthetic
acquisitions at 1/scale resolution — and runs the Trainer end-to-end with
shift-tolerant L1 and cPSNR checkpointing.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from mri_super_resolution_tpu.config import RAMSConfig, TrainerConfig
from mri_super_resolution_tpu.data import available_patients, load_mat
from mri_super_resolution_tpu.fit.trainer import Trainer
from mri_super_resolution_tpu.pipelines.misr import build_rams


def build_dataset(
    hr_size: int = 96, T: int = 9, limit_patients: int | None = None,
    patches_per_slice: int = 4, seed: int = 0, scale: int = 3,
):
    """HR patches + simulated LR acquisition stacks from the anon volumes.

    HR: 96x96 crops of mean-b0 slices scaled to the uint16 range (x256, as
    the MISR inference driver does — multi-image-super-resolution/
    master.py:42-43). LR: 3x-downsampled crops with T shifted Rician-noisy
    copies (the acquisition model of data/synthetic.py).
    """
    from mri_super_resolution_tpu.data import synthetic

    rng = np.random.default_rng(seed)
    data_dir = os.environ.get("MRI_SR_DATA_DIR", "/root/reference/anon_data")
    lr_size = hr_size // scale

    X, Y, pids = [], [], []
    rows = available_patients(data_dir)[:limit_patients]
    for pi, row in enumerate(rows):
        pt_no = row["pt_id"].split("-")[-1]
        vol = np.asarray(
            load_mat(os.path.join(data_dir, f"pat{pt_no}_mean_b0.mat"), "data_mean_b0"),
            dtype=np.float32,
        )
        H, W, S = vol.shape
        for s in range(4, S - 4, 2):
            img = vol[:, :, s] * 256.0
            for _ in range(patches_per_slice):
                y0 = rng.integers(0, H - hr_size)
                x0 = rng.integers(0, W - hr_size)
                hr = img[y0 : y0 + hr_size, x0 : x0 + hr_size]
                if hr.mean() < 10.0:  # skip empty background patches
                    continue
                # LR: block-average downsample then T noisy shifted copies
                lr_base = hr.reshape(lr_size, scale, lr_size, scale).mean((1, 3))
                stack = synthetic.acquisitions_from_b0(
                    lr_base[:, :, None] / 256.0, num_acq=T,
                    seed=int(rng.integers(1 << 31)), noise_sigma_frac=0.02,
                    outlier_prob=0.0,
                )[:, :, 0, :] * 256.0
                X.append(stack.astype(np.float32))
                Y.append(hr[..., None].astype(np.float32))
                pids.append(pi)
    X = np.stack(X)
    Y = np.stack(Y)
    masks = np.ones_like(Y)
    return X, Y, masks, np.asarray(pids)


def split_dataset(X, Y, M, pids, holdout_patients: int = 1):
    """Patient-held-out train/val split.

    The original sequential split (val = first 10% of patches in generation
    order) leaked: val patches came from the same patients — and at the
    boundary the same slice — as train crops, inflating val cPSNR. Holding
    out whole patients makes validation measure generalisation to unseen
    anatomy. scripts/rams_anchor.py keeps the sequential split for
    comparability with the committed artifact's historical anchor.
    """
    if holdout_patients < 1:
        raise ValueError("holdout_patients must be >= 1 (0 would hold out "
                         "EVERY patient: numpy's [-0:] is the full array)")
    val_ids = set(np.unique(pids)[-holdout_patients:].tolist())
    v = np.asarray([p in val_ids for p in pids])
    t = ~v
    return (X[t], Y[t], M[t]), (X[v], Y[v], M[v])


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--hr_size", type=int, default=96)
    p.add_argument("--filters", type=int, default=32)
    p.add_argument("--N", type=int, default=12)
    p.add_argument("--limit_patients", type=int, default=None)
    p.add_argument("--patches_per_slice", type=int, default=4)
    p.add_argument("--evaluate_every", type=int, default=20)
    p.add_argument("--ckpt_dir", default="artifacts/rams_dwi")
    p.add_argument("--data_aug", action="store_true")
    p.add_argument("--learning_rate", type=float, default=1e-4,
                   help="Adam lr (reference recipe 1e-4 at batch 8; the "
                   "validated large-batch recipe is 3.5e-4 at batch 96, "
                   "results/round4_rams/recipe_ab.json)")
    p.add_argument("--lr_schedule", choices=("constant", "cosine"),
                   default="constant",
                   help="cosine decays lr -> 0 over the run: a single-run "
                   "stand-in for the reference's manual lr-decayed "
                   "continuation runs")
    p.add_argument("--grad_accum", type=int, default=1,
                   help="gradient accumulation: optimizer steps see an "
                   "effective batch of batch_size*grad_accum without the "
                   "single-shot VMEM cliff (B=128 one-shot costs 338 ms/"
                   "step, results/round4_rams/batch_sweep_hi.json); "
                   "k micro-batches are exactly one big-batch step")
    p.add_argument("--ema_decay", type=float, default=0.0,
                   help="exponential-moving-average of weights (0 = off, the "
                   "reference behaviour); when > 0 validation and the saved "
                   "checkpoint serve the averaged weights")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--split", choices=("patient", "sequential"), default="patient",
                   help="patient: hold out whole patients for val (no leak); "
                   "sequential: the historical first-10%%-of-patches split "
                   "(kept for comparability with the committed anchor)")
    p.add_argument("--holdout_patients", type=int, default=1)
    p.add_argument("--data_parallel", action="store_true",
                   help="shard each patch batch across all local devices "
                        "(params replicated; gradient all-reduce inserted by "
                        "XLA from the sharding annotations)")
    args = p.parse_args(argv)

    X, Y, M, pids = build_dataset(
        hr_size=args.hr_size, limit_patients=args.limit_patients,
        patches_per_slice=args.patches_per_slice, seed=args.seed,
    )
    if args.split == "patient":
        (Xt, Yt, Mt), (Xv, Yv, Mv) = split_dataset(
            X, Y, M, pids, holdout_patients=args.holdout_patients)
    else:
        # first 10% of patches, independent of batch_size: the committed
        # anchor protocol is val = first 84 of the seed-0 8-patch dataset
        # (artifacts/rams_dwi/anchor.json) and must not move when batch_size
        # does; ragged eval batches are handled exactly by the Trainer.
        n_val = max(8, len(X) // 10)
        Xt, Yt, Mt = X[n_val:], Y[n_val:], M[n_val:]
        Xv, Yv, Mv = X[:n_val], Y[:n_val], M[:n_val]
    print(f"dataset: {len(Xt)} train / {len(Xv)} val patches ({args.split} split), "
          f"LR {Xt.shape[1:]} HR {Yt.shape[1:]}")

    model = build_rams(RAMSConfig(filters=args.filters, N=args.N))
    # optimizer steps per epoch: micro-batches collapse by grad_accum
    micro_per_epoch = -(-len(Xt) // args.batch_size)
    steps_per_epoch = -(-micro_per_epoch // args.grad_accum)
    # cosine resume correctness: Trainer.init auto-restores the checkpoint
    # INCLUDING the schedule's step count, so a resumed run whose decay_steps
    # counted from 0 would spend its whole budget past the cosine's end at
    # lr ~0. Anchor the decay horizon at restored_step + this run's steps.
    restored_step = 0
    if args.lr_schedule == "cosine":
        from mri_super_resolution_tpu.utils.checkpoint import CheckpointManager

        restored_step = CheckpointManager(
            os.path.abspath(args.ckpt_dir)).latest_step() or 0
        if restored_step:
            print(f"cosine schedule resumes from step {restored_step}; "
                  f"decay extended to {restored_step + args.epochs * steps_per_epoch}")
    cfg = TrainerConfig(
        batch_size=args.batch_size, epochs=args.epochs, hr_size=args.hr_size,
        evaluate_every=args.evaluate_every, checkpoint_dir=os.path.abspath(args.ckpt_dir),
        data_aug=args.data_aug, learning_rate=args.learning_rate,
        lr_schedule=args.lr_schedule, ema_decay=args.ema_decay,
        grad_accum=args.grad_accum,
        decay_steps=restored_step + args.epochs * steps_per_epoch,
    )
    mesh = None
    if args.data_parallel:
        import jax
        from jax.sharding import Mesh

        mesh = Mesh(np.array(jax.devices()), ("data",))
        print(f"data-parallel over {mesh.devices.size} devices")
    trainer = Trainer(model, cfg, mesh=mesh)
    trainer.init(Xt, seed=args.seed)
    trainer.fit(Xt, (Yt, Mt), validation_data=(Xv, Yv, Mv), seed=args.seed)
    val_psnr = trainer.evaluate(Xv, Yv, Mv)
    print(f"final val cPSNR: {val_psnr:.2f} dB; checkpoints in {cfg.checkpoint_dir}")


if __name__ == "__main__":
    main()
