#!/usr/bin/env python
"""WIRE fast-transcendental A/B (VERDICT r2 #4): the shared-reduction
exp/sincos path vs builtin transcendentals, at the wiretest.ipynb config,
with convergence parity (same fit, losses compared).

Usage: python scripts/wire_fast_exp.py [--steps 1000]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--out", default="results/round3_wire/fast_ab.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from mri_super_resolution_tpu.core.coords import mgrid
    from mri_super_resolution_tpu.fit.engine import fit_simple
    from mri_super_resolution_tpu.models import Wire
    from mri_super_resolution_tpu.ops.pallas.wire_kernel import (
        make_wire_value_and_grad)
    from mri_super_resolution_tpu.utils import time_jitted

    coords = mgrid((128, 128))
    key = jax.random.key(0)
    # a structured target so convergence parity is meaningful
    xy = coords.reshape(128, 128, 2)
    target = (0.5 + 0.4 * jnp.sin(6 * xy[..., 0]) * jnp.cos(5 * xy[..., 1])
              ).reshape(-1, 1)
    model = Wire(hidden_features=256, hidden_layers=2)
    params = model.init(key, coords)
    tx = optax.adam(5e-3)

    out = {}
    losses = {}
    for label, fast in (("builtin", False), ("fast", True)):
        vag = make_wire_value_and_grad(model, fast=fast)

        def run():
            res = fit_simple(
                model.apply, tx, jax.tree.map(jnp.copy, params), coords,
                target, args.steps, value_and_grad_fn=vag,
            )
            return res.losses

        sec = time_jitted(run, repeats=3, warmup=1)
        ls = jax.device_get(run())
        losses[label] = ls
        vps = coords.shape[0] * args.steps / sec
        out[label] = {"ms_per_step": round(sec / args.steps * 1e3, 4),
                      "voxels_per_sec": round(vps, 1),
                      "final_loss": float(ls[-1])}
        print(f"{label}: {out[label]}", flush=True)

    import numpy as np

    out["speedup"] = round(
        out["fast"]["voxels_per_sec"] / out["builtin"]["voxels_per_sec"], 3)
    out["max_rel_loss_gap_last_100"] = float(np.max(
        np.abs(losses["fast"][-100:] - losses["builtin"][-100:])
        / (np.abs(losses["builtin"][-100:]) + 1e-12)))
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
