"""Sharded training step (pjit / GSPMD).

Replaces the reference's KungFu optimizer wrappers + broadcast
(reference: Model/train.py:454-473,512-559) with a single jitted step whose
inputs carry NamedShardings: batch sharded over ("dp", "sp"), params/opt-state
replicated. XLA inserts the gradient all-reduce over ICI automatically —
the sync-SGD semantics of KUNGFU.Sync_sgd without an external comm library.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from .mesh import batch_sharding, replicated


def make_step_body(
    model,
    loss_fn: Callable[..., tuple[jnp.ndarray, dict]],
    optimizer: optax.GradientTransformation,
) -> Callable:
    """The pure (unsharded) train-step function.

    Exposed separately so correctness checks (e.g. __graft_entry__'s
    dryrun_multichip) can run the IDENTICAL math single-device and compare
    against the GSPMD-sharded execution.
    """

    def step(params, batch_stats, opt_state, images, targets):
        def loss_wrapped(p):
            variables = {"params": p, "batch_stats": batch_stats}
            predict, updates = model.apply(
                variables, images, train=True, mutable=["batch_stats"]
            )
            loss, metrics = loss_fn(predict, targets)
            return loss, (metrics, updates["batch_stats"])

        (loss, (metrics, new_stats)), grads = jax.value_and_grad(
            loss_wrapped, has_aux=True
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = dict(metrics, total_loss=loss)
        return params, new_stats, opt_state, metrics

    return step


def make_sharded_train_step(
    model,
    loss_fn: Callable[..., tuple[jnp.ndarray, dict]],
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    donate: bool = True,
) -> Callable:
    """Build a jitted data-parallel train step.

    loss_fn(predict, batch) -> (loss, metrics dict). The model must accept
    (variables, images, train=True, mutable=["batch_stats"]).
    """
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    step = make_step_body(model, loss_fn, optimizer)
    in_shardings = (rep, rep, rep, bsh, bsh)
    return jax.jit(
        step,
        in_shardings=in_shardings,
        out_shardings=(rep, rep, rep, rep),
        donate_argnums=(0, 1, 2) if donate else (),
    )


def shard_batch(batch, mesh: Mesh):
    """Place a host-global NHWC array batch onto the mesh."""
    return jax.device_put(batch, batch_sharding(mesh))


def replicate_tree(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))
