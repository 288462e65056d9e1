"""Tensor-parallel INR fitting: hidden width sharded over a ``model`` axis.

The reference has no distributed execution at all (SURVEY.md section 2c);
rounds 2-3 added voxel data parallelism, cohort parallelism, batch DP for the
MISR trainer, and multi-host wiring. This module adds the remaining mesh
dimension: **tensor parallelism** over the SIREN hidden width, for fits whose
hidden layer no longer fits (or no longer saturates) one chip — e.g. very
wide INRs for whole-volume fits at native resolution.

Design (Megatron-style alternating column/row parallel, expressed purely as
``jax.sharding`` annotations — XLA/GSPMD inserts every collective; no psum is
written by hand):

- layer 0 (column-parallel): kernel ``P(None, 'model')``, bias ``P('model')``
  — activations come out feature-sharded; ``sin`` is elementwise so the shard
  passes straight through.
- layer 1 (row-parallel): kernel ``P('model', None)``, bias replicated — the
  contraction runs over the sharded feature dim and GSPMD inserts one
  all-reduce per pair of layers (the Megatron trick: one collective per two
  matmuls instead of an all-gather per layer).
- alternate until the final linear head; its spec depends on the parity of
  the sine stack (input feature-sharded iff the stack length is odd).

Composes with voxel data parallelism on a 2-D ``(data, model)`` mesh: the
voxel batch shards over ``data``, the width over ``model``, and the gradient
all-reduce over ``data`` rides the same jit.

This is correctness-first infrastructure: at the production widths the
flagship fused Pallas kernel on one chip is faster (512 wide is far below the
point where TP pays — the collective per layer-pair costs more than the
matmul saves). It exists so the framework scales to widths a single chip
cannot hold, and is exercised by ``dryrun_multichip`` and
``tests/test_tp.py`` with 1-vs-N loss parity.
"""
from __future__ import annotations

import functools
import re
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mri_super_resolution_tpu.fit.losses import mse
from mri_super_resolution_tpu.parallel.sharded_fit import ShardedFitResult

Array = jax.Array

_SINE_RE = re.compile(r"^SineLayer_(\d+)$")
_DENSE_RE = re.compile(r"^Dense_(\d+)$")


def make_tp_mesh(
    data: int = 1, model: int | None = None, devices: Sequence | None = None
) -> Mesh:
    """Build a (data, model) mesh. ``model=None`` uses all remaining devices."""
    devs = list(devices if devices is not None else jax.devices())
    n = len(devs)
    if model is None:
        if n % data:
            raise ValueError(f"{n} devices not divisible by data={data}")
        model = n // data
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} exceeds {n} devices")
    arr = np.asarray(devs[: data * model]).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def siren_tp_specs(params: Any, model_axis: str = "model") -> Any:
    """PartitionSpec tree for a plain ``Siren`` parameter tree.

    Alternates column-/row-parallel over the sine stack (see module
    docstring) and picks the final head's spec from the stack parity.
    Raises on trees that are not a plain Siren (SineLayer_* + one Dense_*):
    the ERD/toy variants carry perturb branches and ReLU heads whose cheap
    layers do not benefit from width sharding.
    """
    has_wrapper = isinstance(params, dict) and set(params) == {"params"}
    inner = params["params"] if has_wrapper else params
    sines = sorted(
        (k for k in inner if _SINE_RE.match(k)),
        key=lambda s: int(s.rsplit("_", 1)[1]),
    )
    finals = [k for k in inner if _DENSE_RE.match(k)]
    if not sines or len(finals) != 1 or set(inner) != set(sines) | set(finals):
        raise ValueError(
            "siren_tp_specs supports plain Siren trees "
            "(SineLayer_0..N + one final Dense); got keys "
            f"{sorted(inner)}"
        )
    specs: dict = {}
    for i, name in enumerate(sines):
        col = i % 2 == 0
        specs[name] = {
            "Dense_0": {
                "kernel": P(None, model_axis) if col else P(model_axis, None),
                "bias": P(model_axis) if col else P(),
            }
        }
    # final head input is feature-sharded iff the LAST sine layer was
    # column-parallel, i.e. the stack length is odd
    final_in_sharded = len(sines) % 2 == 1
    specs[finals[0]] = {
        "kernel": P(model_axis, None) if final_in_sharded else P(),
        "bias": P(),
    }
    return {"params": specs} if has_wrapper else specs


def _check_divisible(params: Any, specs: Any, mesh: Mesh) -> None:
    size = {name: int(n) for name, n in zip(mesh.axis_names, mesh.devices.shape)}

    def chk(path, leaf, spec):
        for dim, ax in enumerate(spec):
            if ax is None:
                continue
            if leaf.shape[dim] % size[ax]:
                raise ValueError(
                    f"param {jax.tree_util.keystr(path)} dim {dim} "
                    f"({leaf.shape[dim]}) not divisible by mesh axis "
                    f"'{ax}' ({size[ax]})"
                )

    jax.tree_util.tree_map_with_path(
        chk, params, specs, is_leaf=lambda x: isinstance(x, P)
    )


def make_tp_fit(
    apply_fn: Callable,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    num_steps: int,
    param_specs: Any,
):
    """Compile a tensor-parallel (optionally data-parallel too) full-batch fit.

    Returns ``fit(params, coords, target) -> ShardedFitResult``. ``coords`` /
    ``target`` lead with the voxel axis (sharded over ``data``); ``params``
    are placed per ``param_specs`` (see :func:`siren_tp_specs`). The Adam
    state is created inside jit and inherits the parameter shardings through
    GSPMD propagation — moments live sharded next to their weights.
    """
    is_spec = lambda x: isinstance(x, P)  # noqa: E731
    pshard = jax.tree.map(
        lambda s: NamedSharding(mesh, s), param_specs, is_leaf=is_spec
    )
    vox = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())

    # No donation: run() places arrays itself, so a caller passing back a
    # previously-returned (already pshard-placed) tree would have its buffers
    # silently consumed by a donating jit — device_put is a no-op then and
    # nothing signals the hand-off. Correctness over the 2x param-memory win.
    @functools.partial(
        jax.jit,
        in_shardings=(pshard, vox, vox),
        out_shardings=(pshard, rep),
    )
    def fit(params, coords, target):
        opt_state = tx.init(params)

        def step(carry, _):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(
                lambda p: mse(apply_fn(p, coords), target)
            )(params)
            updates, opt_state = tx.update(grads, opt_state)
            return (optax.apply_updates(params, updates), opt_state), loss

        (params, _), losses = jax.lax.scan(
            step, (params, opt_state), None, length=num_steps
        )
        return params, losses

    def run(params, coords, target) -> ShardedFitResult:
        _check_divisible(params, param_specs, mesh)
        params = jax.device_put(params, pshard)
        coords = jax.device_put(coords, vox)
        target = jax.device_put(target, vox)
        p, losses = fit(params, coords, target)
        return ShardedFitResult(p, losses)

    return run
