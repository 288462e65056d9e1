"""Multi-chip INR fitting: voxel-sharded gradients + cohort vmap.

Two composable axes (SURVEY.md sections 2c, 5):

1. **Voxel data parallelism** (axis ``data``): the full-volume coordinate
   batch (~1e5-1e6 voxels/step, superresDWI.py:121-135) is sharded across
   chips; each chip computes the loss/grad contribution of its shard and XLA
   inserts the gradient psum over ICI. Params stay replicated.

2. **Cohort parallelism** (axis ``case``): independent per-patient fits are
   vmapped with per-case parameter stacks sharded across the ``case`` axis —
   BASELINE.json config 5's "pmap across chips", expressed with
   ``jax.sharding`` so it composes with the data axis inside one jit.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mri_super_resolution_tpu.fit.losses import mse

Array = jax.Array


class ShardedFitResult(NamedTuple):
    params: Any
    losses: Array


def make_sharded_fit(
    apply_fn: Callable,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    num_steps: int,
    value_and_grad_fn: Callable | None = None,
    n_rows: int | None = None,
    weighted_value_and_grad_fn: Callable | None = None,
):
    """Compile a data-parallel full-batch fit over ``mesh``.

    Returns ``fit(params, coords, target) -> ShardedFitResult`` where
    ``coords``/``target`` lead with the voxel axis (sharded over ``data``)
    and ``params`` are replicated. The scan over steps lives inside jit.

    ``value_and_grad_fn(params, local_coords, local_target) -> (loss, grads)``
    routes the per-shard gradient through the one-pass fused Pallas kernel
    (siren_kernel.make_fused_value_and_grad — build WITHOUT ``n_rows``; each
    shard sees its local row count). GSPMD cannot partition a pallas_call, so
    the kernel path wraps the step's gradient in ``shard_map`` over ``data``:
    every chip runs the kernel on its voxel shard and the loss/grads are
    pmean'd over ICI — exact, because shard_batch guarantees equal shard
    sizes, so the mean-of-local-means IS the global mean.

    ``n_rows``: real (unpadded) voxel count. When the batch was padded with
    mesh.pad_to_multiple so the voxel axis divides the mesh, the padded rows
    carry coordinate 0 / target 0 — training on them would pull the INR
    toward 0 at the volume centre. With ``n_rows`` set, padded rows are
    masked out of the loss and gradient exactly (the reported loss is the
    MSE over real rows). The kernel route then needs the WEIGHTED kernel:
    pass ``weighted_value_and_grad_fn`` built with
    siren_kernel.make_fused_weighted_value_and_grad (without ``n_rows``).
    """
    replicated = NamedSharding(mesh, P())
    vox_sharded = NamedSharding(mesh, P("data"))

    if n_rows is not None and value_and_grad_fn is not None:
        raise ValueError(
            "with n_rows set, use weighted_value_and_grad_fn (the padded "
            "rows ride the weight mask through the weighted kernel)"
        )

    if value_and_grad_fn is not None:
        local_vag = functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), P("data"), P("data")),
            out_specs=(P(), P()),
            check_vma=False,  # pallas_call defeats the replication checker
        )(
            lambda p, c, t: tuple(
                jax.lax.pmean(v, "data") for v in value_and_grad_fn(p, c, t)
            )
        )
    elif weighted_value_and_grad_fn is not None:
        local_vag = functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), P("data"), P("data"), P("data")),
            out_specs=(P(), P()),
            check_vma=False,
        )(
            lambda p, c, t, w: tuple(
                jax.lax.pmean(v, "data")
                for v in weighted_value_and_grad_fn(p, c, t, w)
            )
        )
    else:
        local_vag = None

    @functools.partial(
        jax.jit,
        in_shardings=(replicated, vox_sharded, vox_sharded),
        out_shardings=(replicated, replicated),
        donate_argnums=(0,),
    )
    def fit(params, coords, target):
        opt_state = tx.init(params)
        P_total = coords.shape[0]
        if n_rows is not None:
            mask = (jnp.arange(P_total)[:, None] < n_rows).astype(target.dtype)
            # weighted_mse divides by the PADDED element count; rescale so
            # the loss (and grads) equal the exact MSE over real rows
            rescale = P_total / n_rows
        else:
            mask = None

        def step(carry, _):
            params, opt_state = carry

            def loss_fn(p):
                pred = apply_fn(p, coords)
                if mask is None:
                    return mse(pred, target)
                return rescale * jnp.mean(mask * (pred - target) ** 2)

            if local_vag is not None and mask is not None:
                loss, grads = local_vag(params, coords, target, mask)
                loss = rescale * loss
                grads = jax.tree.map(lambda g: rescale * g, grads)
            elif local_vag is not None:
                loss, grads = local_vag(params, coords, target)
            else:
                loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state)
            return (optax.apply_updates(params, updates), opt_state), loss

        (params, _), losses = jax.lax.scan(step, (params, opt_state), None, length=num_steps)
        return params, losses

    def run(params, coords, target) -> ShardedFitResult:
        params, losses = fit(params, coords, target)
        return ShardedFitResult(params, losses)

    return run


def make_cohort_fit(
    apply_fn: Callable,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    num_steps: int,
):
    """Compile a cohort-parallel fit: vmapped over a leading case axis.

    Inputs:
      params_stack — pytree with leading case axis (sharded over ``case``)
      coords       — (C, P, d) case-stacked voxel batches, sharded
                     P('case', 'data')
      targets      — (C, P, 1), same sharding

    Each case trains independently; chips along ``data`` cooperate on each
    case's gradient psum, and different ``case`` rows of the mesh train
    different patients simultaneously.
    """
    case_sharded = NamedSharding(mesh, P("case"))
    batch_sharded = NamedSharding(mesh, P("case", "data"))

    @functools.partial(
        jax.jit,
        in_shardings=(case_sharded, batch_sharded, batch_sharded),
        out_shardings=(case_sharded, case_sharded),
        donate_argnums=(0,),
    )
    def fit(params_stack, coords, targets):
        def one_case(params, c, t):
            opt_state = tx.init(params)

            def step(carry, _):
                params, opt_state = carry

                def loss_fn(p):
                    return mse(apply_fn(p, c), t)

                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = tx.update(grads, opt_state)
                return (optax.apply_updates(params, updates), opt_state), loss

            (params, _), losses = jax.lax.scan(
                step, (params, opt_state), None, length=num_steps
            )
            return params, losses

        return jax.vmap(one_case)(params_stack, coords, targets)

    def run(params_stack, coords, targets) -> ShardedFitResult:
        params, losses = fit(params_stack, coords, targets)
        return ShardedFitResult(params, losses)

    return run


def stack_params(params_list: list) -> Any:
    """Stack per-case parameter pytrees along a new leading axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *params_list)
