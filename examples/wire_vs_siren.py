#!/usr/bin/env python
"""WIRE vs SIREN on a single DWI slice — the wiretest.ipynb capability.

Reference: implicit-neural-representations/wiretest.ipynb fits the
complex-Gabor WIRE INR (INRmodel.py:66-120) to a slice and takes the real
part of the output. Here both INR families fit the same pat07 mean-b0 slice
and report PSNR vs a bicubic baseline.

Run: python examples/wire_vs_siren.py [--steps 800]
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

from mri_super_resolution_tpu.core.coords import mgrid
from mri_super_resolution_tpu.core.metrics import psnr
from mri_super_resolution_tpu.data import load_mat
from mri_super_resolution_tpu.fit.engine import fit_simple
from mri_super_resolution_tpu.models import Siren, Wire


def load_slice():
    path = os.path.join(
        os.environ.get("MRI_SR_DATA_DIR", "/root/reference/anon_data"),
        "pat07_mean_b0.mat",
    )
    if os.path.exists(path):
        vol = np.asarray(load_mat(path, "data_mean_b0"), dtype=np.float32)
        img = vol[:, :, 14]
    else:
        from mri_super_resolution_tpu.data import synthetic

        img = synthetic.toy_image(128)
    return img / img.max()


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=800)
    p.add_argument("--hidden", type=int, default=128)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    img = load_slice()
    H, W = img.shape
    coords = mgrid((H, W))
    target = jnp.asarray(img.reshape(-1, 1))

    # bicubic reference point: downsample 2x and spline back up — the
    # trivial interpolation any INR fit must beat (wiretest.ipynb baseline)
    from mri_super_resolution_tpu.core.interp import rescale

    lr_img = rescale(jnp.asarray(img), 0.5, anti_aliasing=True)
    bicubic = rescale(lr_img, 2, anti_aliasing=True)[:H, :W]
    print(f"bicubic(2x) baseline: PSNR "
          f"{float(psnr(jnp.asarray(img), bicubic)):.2f} dB")

    results = {}
    for name, model, lr in (
        ("SIREN", Siren(hidden_features=args.hidden, hidden_layers=2), 3e-4),
        ("WIRE", Wire(hidden_features=args.hidden, hidden_layers=2), 5e-3),
    ):
        params = model.init(jax.random.key(args.seed), coords)
        res = fit_simple(model.apply, optax.adam(lr), params, coords, target, args.steps)
        recon = model.apply(res.params, coords).reshape(H, W)
        results[name] = (float(res.losses[-1]), float(psnr(jnp.asarray(img), recon)))
        print(f"{name}: final loss {results[name][0]:.3e}, PSNR {results[name][1]:.2f} dB")


if __name__ == "__main__":
    main()
