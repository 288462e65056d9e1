#!/usr/bin/env python
"""FF-INR fit with periodic reconstruction snapshots — automate_INR.py equivalent.

Reference: implicit-neural-representations/automate_INR.py:20-111 — toy2.mat
perturbed acquisitions (256^2 x 50), Fourier mapping (128, scale 2.0),
Siren(2*128 -> 128x3): 500 epochs on the mean then odd-epoch INR steps (the
per-acquisition PerturbNet branch is present but commented out in the
reference; enable it here with --use_pn), snapshotting the dense
reconstruction every 100 epochs, final recon saved as .mat.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mri_super_resolution_tpu.core.coords import mgrid, fourier_matrix, fourier_encode
from mri_super_resolution_tpu.data import load_mat, save_mat, synthetic
from mri_super_resolution_tpu.fit.engine import fit_simple, fit_alternating_pn, infer_grid
from mri_super_resolution_tpu.models import Siren, PerturbNet


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--toy_mat", default=None, help="toy2.mat with 'pertubed_acq'")
    p.add_argument("--side", type=int, default=256)
    p.add_argument("--num_acq", type=int, default=50)
    p.add_argument("--mapping_size", type=int, default=128)
    p.add_argument("--ff_scale", type=float, default=2.0)
    p.add_argument("--hidden", type=int, default=128)
    p.add_argument("--layers", type=int, default=3)
    p.add_argument("--epochs", type=int, default=2000)
    p.add_argument("--mean_epochs", type=int, default=500)
    p.add_argument("--snapshot_every", type=int, default=100)
    p.add_argument("--use_pn", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    if args.toy_mat:
        acqs = np.asarray(load_mat(args.toy_mat, "pertubed_acq"), dtype=np.float32)
    else:
        acqs = synthetic.toy_perturbed_acquisitions(args.side, args.num_acq, args.seed)
    side = acqs.shape[0]
    mean_img = acqs.mean(-1)
    mean_img = mean_img / mean_img.max()

    key = jax.random.key(args.seed)
    kB, kI, kP = jax.random.split(key, 3)
    B = fourier_matrix(kB, args.mapping_size, 2, scale=args.ff_scale)
    coords = mgrid((side, side))
    ff = fourier_encode(coords, B)
    target = jnp.asarray(mean_img.reshape(-1, 1))

    inr = Siren(hidden_features=args.hidden, hidden_layers=args.layers)
    params = inr.init(kI, ff[:8])
    tx = optax.adam(1e-4)

    snapshots = []
    done = 0
    encode = lambda c: fourier_encode(c, B)

    def snapshot(params):
        rec = infer_grid(inr.apply, params, coords, encode)
        snapshots.append(np.asarray(rec).reshape(side, side))

    if args.use_pn:
        acq_pixels = jnp.asarray(
            (np.moveaxis(acqs, -1, 0) / acqs.max()).reshape(acqs.shape[-1], -1, 1)
        )
        pn = PerturbNet(hidden_features=args.hidden, dimension=2)
        pn_params = pn.init(kP, ff[:8], 0, 0.0)
        # mean phase, then alternating with snapshots per chunk; optimizer
        # state carries across chunk boundaries (one logical schedule)
        opt_state = pn_opt_state = None
        pn_tx = optax.adam(1e-6)
        while done < args.epochs:
            chunk = min(args.snapshot_every, args.epochs - done)
            if done < args.mean_epochs:
                # clip the chunk at the phase boundary so the mean phase
                # runs EXACTLY mean_epochs steps (a chunk straddling the
                # boundary used to flip whole to alternating early)
                chunk = min(chunk, args.mean_epochs - done)
                res = fit_simple(inr.apply, tx, params, ff, target, chunk,
                                 opt_state=opt_state)
                params, opt_state = res.params, res.opt_state
            else:
                res = fit_alternating_pn(
                    inr.apply, pn.apply, tx, pn_tx, params, pn_params,
                    ff, target, acq_pixels, B, num_epochs=chunk, pn_epochs=chunk,
                    inr_opt_state=opt_state, pn_opt_state=pn_opt_state,
                )
                params, pn_params = res.inr_params, res.pn_params
                opt_state, pn_opt_state = res.inr_opt_state, res.pn_opt_state
            done += chunk
            snapshot(params)
            print(f"epoch {done}: loss {float(res.losses[-1]):.3e}")
    else:
        opt_state = None
        while done < args.epochs:
            chunk = min(args.snapshot_every, args.epochs - done)
            res = fit_simple(inr.apply, tx, params, ff, target, chunk,
                             opt_state=opt_state)
            params, opt_state = res.params, res.opt_state
            done += chunk
            snapshot(params)
            print(f"epoch {done}: loss {float(res.losses[-1]):.3e}")

    recon = snapshots[-1]
    out = args.out or f"nonPILoutput_b_{args.ff_scale}_emb_{args.mapping_size}.mat"
    save_mat(out, {"recon": recon, "sr_epochs": np.stack(snapshots, -1)})
    print(f"saved {out} ({len(snapshots)} snapshots)")


if __name__ == "__main__":
    main()
