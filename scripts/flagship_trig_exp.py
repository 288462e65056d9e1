"""A/B the fused-kernel trig cost on the real chip (VERDICT r2 #5).

Hypothesis: the one-pass kernel is VPU-bound on _fast_sincos; the cos factor
only feeds the backward (and is stashed bf16), so a shorter cos polynomial
should be free accuracy-wise. sin drives the forward value, so it keeps
near-f32 accuracy (6 coeffs, |err| ~5e-7).

Variants (monkeypatched _fast_sincos; proper plumbing only if a variant wins):
  base      : 7-coeff sin / 7-coeff cos (current production)
  short_cos : 7-coeff sin / 4-coeff cos  (bf16-stash-accurate factor)
  short_both: 6-coeff sin / 4-coeff cos

Measures ms/step over 600 scanned steps and the final fit loss (convergence
parity gate: final loss within 2x of base on the flagship-shaped fit).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mri_super_resolution_tpu.ops.pallas import siren_kernel as sk

# 6-coeff sin (|err| ~5e-7 on [-pi,pi]) and 4-coeff cos (|err| ~6e-5 —
# below the bf16 stash quantum of the backward factor)
_SIN6 = (9.99999995e-01, -1.66666592e-01, 8.33320519e-03, -1.98393147e-04,
         2.72217584e-06, -2.33518571e-08)
_COS4 = (9.99996269e-01, -4.99940902e-01, 4.14736146e-02, -1.27121979e-03)


def make_sincos(sin_c, cos_c):
    def fast_sincos(z, need_cos=True):
        k = jnp.round(z * sk._INV_2PI)
        r = (z - k * sk._PI2_HI) - k * sk._PI2_LO
        r2 = r * r
        s = sin_c[-1]
        for c in sin_c[-2::-1]:
            s = s * r2 + c
        s = s * r
        if not need_cos:
            return s, None
        c_ = cos_c[-1]
        for c in cos_c[-2::-1]:
            c_ = c_ * r2 + c
        return s, c_
    return fast_sincos


def run_fit(steps=600):
    from mri_super_resolution_tpu.core.coords import (
        fourier_matrix, fourier_encode, mgrid)
    from mri_super_resolution_tpu.fit.engine import fit_simple
    from mri_super_resolution_tpu.models import Siren

    key = jax.random.key(0)
    coords = mgrid((25, 25, 28, 4))
    B = fourier_matrix(key, 128, 4, scale=0.5)
    ff = fourier_encode(coords, B)
    target = jax.random.uniform(key, (coords.shape[0], 1))
    model = Siren(hidden_features=512, hidden_layers=3)
    params = model.init(key, ff[:8])
    n_real = coords.shape[0]
    vag = sk.make_fused_value_and_grad.__wrapped__(model, n_rows=n_real) \
        if hasattr(sk.make_fused_value_and_grad, "__wrapped__") \
        else sk.make_fused_value_and_grad(model, n_rows=n_real)
    ffp, tp = sk.pad_rows_to(ff, 512), sk.pad_rows_to(target, 512)

    def run():
        res = fit_simple(model.apply, optax.adam(1e-4),
                         jax.tree.map(jnp.copy, params), ffp, tp, steps,
                         value_and_grad_fn=vag)
        return res.losses

    losses = jax.device_get(run())  # compile + convergence sample
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(run())
        best = min(best, (time.perf_counter() - t0) / steps)
    return best, float(losses[-1]), n_real


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--out", default="results/round3_flagship/trig_ab.json")
    args = ap.parse_args()

    variants = {
        "base": (sk._SIN_C, sk._COS_C),
        "short_cos": (sk._SIN_C, _COS4),
        "short_both": (_SIN6, _COS4),
    }
    orig = sk._fast_sincos
    out = {}
    for name, (sc, cc) in variants.items():
        sk._fast_sincos = make_sincos(sc, cc)
        # bust the jit/builder caches so the new closure actually compiles in
        sk.make_fused_value_and_grad.cache_clear()
        jax.clear_caches()
        sec, loss, n = run_fit(args.steps)
        out[name] = {"ms_per_step": round(sec * 1e3, 4),
                     "voxels_per_sec": round(n / sec, 1),
                     "final_loss": loss}
        print(name, out[name], flush=True)
    sk._fast_sincos = orig

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    json.dump(out, open(args.out, "w"), indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
