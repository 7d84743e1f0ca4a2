"""Distributed gradient-exchange modes.

TPU-native equivalents of the reference's three KungFu optimizer wrappers
(reference: Model/train.py:454-456,512-522; Config/define.py:33-36):

  Sync_sgd  — synchronous gradient all-reduce. The default GSPMD train step
              already IS this: batch sharded over "dp", params replicated,
              XLA inserts the psum.
  Sync_avg  — each device steps on its LOCAL gradients, then model weights
              are averaged across devices (SynchronousAveragingOptimizer).
  Pair_avg  — gossip: each device averages weights with ONE partner per
              step, pairing alternating by step parity
              (PairAveragingOptimizer); convergence by mixing.

Sync_avg/Pair_avg run the per-device step inside shard_map so the gradient
all-reduce is suppressed and the weight exchange is explicit (pmean /
ppermute over ICI). Optimizer moments are pmean'd alongside the weights to
keep the replicated-state invariant sound.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P


def _pmean_floats(tree, axis: str):
    return jax.tree.map(
        lambda x: jax.lax.pmean(x, axis)
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree,
    )


def make_local_step_train_fn(
    model, loss_fn: Callable, optimizer: optax.GradientTransformation,
    mesh: Mesh, mode: str = "sync_avg", preprocess: Callable | None = None,
):
    """Build a jitted train step with Sync_avg or Pair_avg semantics.

    loss_fn(predict, targets) -> (loss, metrics dict).
    step(params, batch_stats, opt_state, images, targets, step_i).
    """
    if mode not in ("sync_avg", "pair_avg"):
        raise ValueError(mode)

    from jax import shard_map

    dp = int(mesh.shape["dp"])
    # Two involutive pairings (dp must be even for pair_avg):
    even_pairs = [(i, i ^ 1) for i in range(dp)]
    odd_pairs = [
        (i, (i + 1) % dp if i % 2 == 1 else (i - 1) % dp) for i in range(dp)
    ]

    def device_step(params, batch_stats, opt_state, images, targets, step_i):
        def loss_wrapped(p):
            variables = {"params": p, "batch_stats": batch_stats}
            x = preprocess(images) if preprocess is not None else images
            predict, updates = model.apply(
                variables, x, train=True, mutable=["batch_stats"]
            )
            loss, metrics = loss_fn(predict, targets)
            return loss, (metrics, updates.get("batch_stats", batch_stats))

        (loss, (metrics, new_stats)), grads = jax.value_and_grad(
            loss_wrapped, has_aux=True
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

        if mode == "sync_avg":
            params = _pmean_floats(params, "dp")
        else:
            def mix(x):
                if not jnp.issubdtype(x.dtype, jnp.floating):
                    return x
                e = jax.lax.ppermute(x, "dp", even_pairs)
                o = jax.lax.ppermute(x, "dp", odd_pairs)
                other = jnp.where(step_i % 2 == 0, e, o)
                return 0.5 * (x + other)

            params = jax.tree.map(mix, params)
        opt_state = _pmean_floats(opt_state, "dp")
        new_stats = _pmean_floats(new_stats, "dp")
        metrics = _pmean_floats(metrics, "dp")
        loss = jax.lax.pmean(loss, "dp")
        return params, new_stats, opt_state, dict(metrics, total_loss=loss)

    rep = P()
    img = P("dp")

    sharded = shard_map(
        device_step, mesh=mesh,
        in_specs=(rep, rep, rep, img, img, rep),
        out_specs=(rep, rep, rep, rep),
        check_vma=False,
    )
    return jax.jit(sharded)
