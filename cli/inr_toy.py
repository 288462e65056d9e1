#!/usr/bin/env python
"""Smallest runnable INR fit — the ``inr_toy.py`` equivalent.

Reference: implicit-neural-representations/inr_toy.py:65-115 — fit a
Siren(2 -> 128x3) to the mean of toy perturbed acquisitions with a
loss-increase early stop, then save the model.

TPU-native differences: the fit is one jitted lax.scan chunk per check
interval (the early-stop comparison happens between chunks on the host, so
the hot loop never leaves the device), and the checkpoint is orbax.

CPU-runnable (BASELINE.json config 1).
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np
import optax

from mri_super_resolution_tpu.core.coords import mgrid
from mri_super_resolution_tpu.data import synthetic, load_mat
from mri_super_resolution_tpu.fit.engine import fit_simple, infer_grid
from mri_super_resolution_tpu.models import SirenToy
from mri_super_resolution_tpu.utils import save_pytree


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--toy_mat", default=None, help="optional toy.mat with 'pertubed_acq'")
    p.add_argument("--side", type=int, default=128)
    p.add_argument("--num_acq", type=int, default=20)
    p.add_argument("--hidden_features", type=int, default=128)
    p.add_argument("--hidden_layers", type=int, default=3)
    p.add_argument("--learning_rate", type=float, default=3e-4)
    p.add_argument("--check_every", type=int, default=100)
    p.add_argument("--max_steps", type=int, default=5000)
    p.add_argument("--out", default="toy_model")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    if args.toy_mat:
        acquisitions = 1 - np.asarray(load_mat(args.toy_mat, "pertubed_acq"), dtype=np.float32)
    else:
        acquisitions = synthetic.toy_perturbed_acquisitions(args.side, args.num_acq, args.seed)
    mean_img = acquisitions.mean(-1)
    mean_img = mean_img / mean_img.max()
    side = mean_img.shape[0]

    coords = mgrid(mean_img.shape)
    target = jax.numpy.asarray(mean_img.reshape(-1, 1))

    model = SirenToy(
        hidden_features=args.hidden_features, hidden_layers=args.hidden_layers
    )
    params = model.init(jax.random.key(args.seed), coords)
    tx = optax.adam(args.learning_rate)

    # loss-increase early stop (inr_toy.py:97-100), checked per scan chunk
    prev = np.inf
    t0 = time.perf_counter()
    total = 0
    opt_state = None
    while total < args.max_steps:
        res = fit_simple(model.apply, tx, params, coords, target,
                         args.check_every, opt_state=opt_state)
        params, opt_state = res.params, res.opt_state
        loss = float(res.losses[-1])
        total += args.check_every
        print(f"step {total}: loss {loss:.3e}")
        if (loss > prev and total > 100) or loss < 1e-9:
            break
        prev = loss
    dt = time.perf_counter() - t0

    recon = np.asarray(
        infer_grid(model.apply, params, mgrid((side, side)))
    ).reshape(side, side)
    mse = float(np.mean((recon - mean_img) ** 2))
    vox_per_sec = total * coords.shape[0] / dt
    print(f"final mse {mse:.3e}; {vox_per_sec:,.0f} voxels/sec over {total} steps")

    save_pytree(args.out, params)
    print(f"saved {args.out}")
    return mse


if __name__ == "__main__":
    main()
