"""Multi-host readiness (VERDICT r2 #3 / SURVEY.md §5).

Single-process pieces run on the suite's virtual 8-CPU mesh; the real
cross-process path runs as a 2-process CPU simulation via jax.distributed
(each subprocess owns one device), checked for loss parity against a
single-process fit of the identical problem.
"""
import json
import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

from mri_super_resolution_tpu.core.coords import mgrid
from mri_super_resolution_tpu.models import Siren
from mri_super_resolution_tpu.parallel import (
    host_local_slice, make_global_batch, make_mesh, make_sharded_fit,
    restore_sharded, save_sharded, shard_batch)


def test_host_local_slice_partitions():
    """Slices across processes must tile [0, n) without overlap (checked
    here for the single-process degenerate case: the identity slice)."""
    sl = host_local_slice(10)
    assert (sl.start, sl.stop) == (0, 10)


def test_make_global_batch_single_process():
    mesh = make_mesh(case=1)
    x = np.arange(64, dtype=np.float32).reshape(16, 4)
    g = make_global_batch(x, mesh, P("data"))
    assert g.shape == (16, 4)
    np.testing.assert_array_equal(jax.device_get(g), x)


def test_sharded_checkpoint_roundtrip(tmp_path):
    """save_sharded/restore_sharded preserve values AND shardings for arrays
    sharded over the virtual 8-device mesh."""
    mesh = make_mesh(case=1)
    x = shard_batch(jnp.arange(128, dtype=jnp.float32).reshape(32, 4), mesh)
    tree = {"x": x, "scalar": jnp.float32(3.5)}
    path = str(tmp_path / "ckpt")
    save_sharded(path, tree)
    back = restore_sharded(path, tree)
    np.testing.assert_array_equal(jax.device_get(back["x"]), jax.device_get(x))
    assert back["x"].sharding.is_equivalent_to(x.sharding, x.ndim)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _reference_losses(steps=3):
    """The same fit on one process/one device (ground truth for parity)."""
    model = Siren(hidden_features=64, hidden_layers=2, out_features=1)
    coords_all = np.asarray(mgrid((16, 16)))
    target_all = np.sin(3.0 * coords_all[:, :1]) * np.cos(2.0 * coords_all[:, 1:2])
    mesh = make_mesh(case=1, devices=jax.devices()[:1])
    params = model.init(jax.random.key(0), jnp.asarray(coords_all[:4]))
    fit = make_sharded_fit(model.apply, optax.adam(1e-4), mesh, num_steps=steps)
    res = fit(params, shard_batch(jnp.asarray(coords_all), mesh),
              shard_batch(jnp.asarray(target_all), mesh))
    return np.asarray(jax.device_get(res.losses)).reshape(-1)


def test_two_process_cpu_simulation(tmp_path):
    """Launch 2 OS processes, each with ONE cpu device, joined through
    jax.distributed; run the production data-parallel fit over the global
    2-device mesh; assert loss parity with a single-process fit and a
    successful sharded-checkpoint roundtrip."""
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    worker = os.path.join(os.path.dirname(__file__), "_distributed_worker.py")
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, "2", str(pid), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        outs.append(out.decode(errors="replace"))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"

    ref = _reference_losses()
    for pid in range(2):
        rec = json.load(open(tmp_path / f"proc{pid}.json"))
        assert rec["process_count"] == 2
        np.testing.assert_allclose(rec["losses"], ref, rtol=1e-4, atol=1e-6)
