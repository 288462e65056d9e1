#!/usr/bin/env python
"""PIA training + tissue-map inference CLI.

Reference: implicit-neural-representations/PIA.py defines the model, losses,
and synthetic generator; training lived in (undistributed) notebooks. This
driver pretrains on synthetic 3-compartment draws, optionally fine-tunes
unsupervised on real hybrid voxels with PIDS weighting, and emits D/T2/v maps.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mri_super_resolution_tpu.models import PIA
from mri_super_resolution_tpu.pipelines import pia_train
from mri_super_resolution_tpu.utils import save_pytree


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--noise_std", type=float, default=0.1)
    p.add_argument("--noise_range", type=float, nargs=2, default=None,
                   metavar=("LO", "HI"),
                   help="train with per-voxel sigma log-uniform in [LO, HI] "
                   "(one encoder for all noise levels) instead of --noise_std")
    p.add_argument("--unsupervised", action="store_true",
                   help="signal-only loss instead of supervised D/T2/v loss")
    p.add_argument("--finetune_hybrid", default=None,
                   help="npz with 'signals' (N, 16) real voxels for PIDS fine-tune")
    p.add_argument("--finetune_steps", type=int, default=500)
    p.add_argument("--out", default="pia_model")
    p.add_argument("--maps_out", default=None, help="npz path for D/T2/v maps")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    model = PIA()
    res = pia_train.train_synthetic(
        model, jax.random.key(args.seed), steps=args.steps,
        batch_size=args.batch_size, lr=args.lr, noise_std=args.noise_std,
        noise_range=tuple(args.noise_range) if args.noise_range else None,
        supervised=not args.unsupervised,
    )
    print(f"pretrain: loss {float(res.losses[0]):.4f} -> {float(res.losses[-1]):.4f}")

    params = res.params
    if args.finetune_hybrid:
        data = np.load(args.finetune_hybrid)
        signals = jnp.asarray(data["signals"], jnp.float32)
        if "pids" in data:
            pids = jnp.asarray(data["pids"], jnp.float32)
        else:
            pids = jnp.ones_like(signals)
        ft = pia_train.finetune_on_voxels(
            model, params, signals, pids, steps=args.finetune_steps
        )
        params = ft.params
        print(f"fine-tune: loss {float(ft.losses[0]):.4f} -> {float(ft.losses[-1]):.4f}")
        if args.maps_out:
            D, T2, v = pia_train.predict_maps(model, params, signals)
            np.savez(args.maps_out, D=np.asarray(D), T2=np.asarray(T2), v=np.asarray(v))
            print(f"maps written to {args.maps_out}")
    elif args.maps_out:
        p.error("--maps_out needs voxel signals: pass --finetune_hybrid too")

    save_pytree(os.path.abspath(args.out), params)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
