"""Does restart_adam cut fit_until's steps-to-threshold on the ERD config?

fit_until trains to loss < 2e-5 (INR_ERD.py:201-217), so fewer steps is a
direct wall-clock win for every cohort sweep. Multi-seed steps-to-threshold
A/B on a synthetic slice at the production configuration (SirenERD 128x3 +
ReLU head, [0,1]-space target, fused absmax kernel on TPU).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SEEDS = (0, 1, 2, 3, 4, 5)


def main():
    import jax
    import jax.numpy as jnp

    from mri_super_resolution_tpu.core.coords import mgrid
    from mri_super_resolution_tpu.data import load_mat
    from mri_super_resolution_tpu.fit.engine import fit_until, plain_apply_init
    from mri_super_resolution_tpu.fit.optim import cached_adam, restart_adam
    from mri_super_resolution_tpu.models import SirenERD
    from mri_super_resolution_tpu.ops.pallas.siren_kernel import (
        tpu_value_grad_absmax)

    data_dir = os.environ.get("MRI_SR_DATA_DIR", "/root/reference/anon_data")
    b0_path = os.path.join(data_dir, "pat07_mean_b0.mat")
    if os.path.exists(b0_path):
        b0 = np.asarray(load_mat(b0_path, "data_mean_b0"), dtype=np.float32)
        img = b0[:, :, b0.shape[2] // 2]
        img = img / (img.max() + 1e-7)
    else:
        rng = np.random.default_rng(0)
        img = np.abs(rng.normal(0.5, 0.2, (128, 128))).astype(np.float32)
    H, W = img.shape
    coords = mgrid((H, W))
    target = jnp.asarray(img.reshape(-1, 1))

    model = SirenERD(hidden_features=128, hidden_layers=3, perturb=True)
    apply_plain, init_fn = plain_apply_init(model)
    vag = tpu_value_grad_absmax(model)

    variants = {
        "adam_3e-4_flat (reference)": cached_adam(3e-4),
        "restart_adam(3e-4, 100)": restart_adam(3e-4, 100),
        "restart_adam(3e-4, 250)": restart_adam(3e-4, 250),
    }
    out = {}
    for name, tx in variants.items():
        steps_list, loss_list = [], []
        for seed in SEEDS:
            params, steps, loss = fit_until(
                apply_plain, tx, init_fn, jax.random.key(seed), coords,
                target, loss_threshold=2e-5, max_steps=20_000,
                value_grad_absmax_fn=vag,
            )
            steps_list.append(int(steps))
            loss_list.append(float(loss))
        out[name] = {"steps": steps_list,
                     "median_steps": int(np.median(steps_list)),
                     "hit_threshold": sum(l <= 2e-5 for l in loss_list),
                     "final_losses": loss_list}
        print(name, out[name]["median_steps"], out[name]["steps"], flush=True)

    path = "results/round3_flagship/erd_restart.json"
    json.dump(out, open(path, "w"), indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
