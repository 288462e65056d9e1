"""Worker process for the 2-process CPU multi-host simulation
(tests/test_distributed.py). Each process owns ONE virtual CPU device; the
pair forms a global 2-device mesh over jax.distributed — the smallest faithful
model of the multi-host (DCN) path in SURVEY.md §5.

argv: <coordinator> <num_processes> <process_id> <out_dir>
"""
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=1"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import json  # noqa: E402

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mri_super_resolution_tpu.models import Siren  # noqa: E402
from mri_super_resolution_tpu.core.coords import mgrid  # noqa: E402
from mri_super_resolution_tpu.parallel import (  # noqa: E402
    global_mesh, host_local_slice, init_distributed, make_global_batch,
    make_sharded_fit, restore_sharded, save_sharded, shard_batch)


def main():
    coord, nproc, pid, out_dir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    multi = init_distributed(coord, nproc, pid)
    assert multi, "expected a multi-process runtime"
    assert jax.process_count() == nproc and jax.device_count() == nproc

    mesh = global_mesh(case=1)

    # --- process-local host data -> one global sharded batch ---------------
    model = Siren(hidden_features=64, hidden_layers=2, out_features=1)
    coords_all = np.asarray(mgrid((16, 16)))
    target_all = np.sin(3.0 * coords_all[:, :1]) * np.cos(2.0 * coords_all[:, 1:2])
    sl = host_local_slice(coords_all.shape[0])
    n = coords_all.shape[0]
    coords = make_global_batch(coords_all[sl], mesh, P("data"), global_rows=n)
    target = make_global_batch(target_all[sl], mesh, P("data"), global_rows=n)

    # --- the production data-parallel fit over the cross-process mesh ------
    params = model.init(jax.random.key(0), jnp.asarray(coords_all[:4]))
    steps = 3
    fit = make_sharded_fit(model.apply, optax.adam(1e-4), mesh, num_steps=steps)
    res = fit(params, coords, target)
    losses = np.asarray(jax.device_get(res.losses)).reshape(-1)

    # --- sharded checkpoint roundtrip (every process participates) ---------
    ckpt = os.path.join(out_dir, "ckpt")
    save_sharded(ckpt, {"params": res.params, "coords": coords})
    back = restore_sharded(ckpt, {"params": res.params, "coords": coords})
    l0 = jax.tree.leaves(res.params)[0]
    r0 = jax.tree.leaves(back["params"])[0]
    assert np.allclose(jax.device_get(l0), jax.device_get(r0))

    with open(os.path.join(out_dir, f"proc{pid}.json"), "w") as f:
        json.dump({"losses": [float(x) for x in losses],
                   "process_count": jax.process_count()}, f)
    print(f"proc {pid} ok", flush=True)


if __name__ == "__main__":
    main()
