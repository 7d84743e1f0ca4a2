"""Domain-adaptation discriminator + adversarial extension."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from hyperpose_tpu.models.openpose import LightWeightOpenPose
from hyperpose_tpu.train.domainadapt import (
    Discriminator, discriminator_losses, make_domainadapt_extension,
)


def test_discriminator_shapes_and_losses():
    disc = Discriminator()
    feats = jnp.zeros((2, 8, 8, 128))
    variables = disc.init(jax.random.PRNGKey(0), feats)
    logits = disc.apply(variables, feats)
    assert logits.shape == (2,)
    g, d = discriminator_losses(jnp.array([2.0, 3.0]), jnp.array([-2.0]))
    assert float(d) < 0.2  # well separated -> low d loss
    assert float(g) > 1.0  # generator loss high when unlabeled detected


def test_domainadapt_extension_steps():
    model = LightWeightOpenPose(dtype=jnp.float32)
    hw = (32, 32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, *hw, 3)), train=True
    )
    params, stats = variables["params"], variables["batch_stats"]

    disc = Discriminator()
    feats_shape = model.apply(
        variables, jnp.zeros((1, *hw, 3)), train=False, ret_backbone=True
    )["backbone_features"].shape
    d_vars = disc.init(jax.random.PRNGKey(1), jnp.zeros(feats_shape))
    d_params = d_vars["params"]
    d_opt = optax.adam(1e-4)
    d_state = d_opt.init(d_params)

    g_loss_fn, d_step_fn = make_domainadapt_extension(model, disc, d_opt)
    unlabeled = jnp.asarray(
        np.random.default_rng(0).random((2, *hw, 3)).astype(np.float32)
    )
    g_loss = g_loss_fn(params, stats, d_params, unlabeled)
    assert np.isfinite(float(g_loss))
    # g_loss is differentiable w.r.t. the pose model params
    grads = jax.grad(
        lambda p: g_loss_fn(p, stats, d_params, unlabeled)
    )(params)
    assert max(
        float(jnp.abs(g).max()) for g in jax.tree.leaves(grads)
    ) > 0

    feats = model.apply(
        {"params": params, "batch_stats": stats}, unlabeled,
        train=False, ret_backbone=True,
    )["backbone_features"]
    d_params2, d_state2, d_loss = d_step_fn(
        d_params, d_state, feats, feats + 0.5
    )
    assert np.isfinite(float(d_loss))
