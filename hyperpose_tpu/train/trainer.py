"""Training pipelines: single- and multi-device pose training.

Replaces the reference's train loops (reference: Model/train.py:94-325
single_train, :327-588 parallel_train + KungFu) with ONE sharded
implementation: the same jitted step serves 1..N devices via the
("dp", "sp") mesh; gradient sync is XLA-inserted (Sync_sgd semantics).
Target-map generation is fused into the step so the host ships only uint8
images + keypoint arrays.
"""
from __future__ import annotations

import logging
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import OPTIM, Config
from ..data.pipeline import TrainPipeline
from ..data.targets import openpose_targets
from ..models.openpose import openpose_loss
from jax.sharding import NamedSharding, PartitionSpec as P

from ..parallel.mesh import batch_sharding, make_mesh, replicated
from ..train.checkpoint import CheckpointManager, save_weights_npz
from ..train.metrics import MetricManager

logger = logging.getLogger("hyperpose_tpu.TRAIN")


def staged_lr_schedule(cfg: Config) -> optax.Schedule:
    """lr_init scaled by lr_decay_factor every lr_decay_every_step steps
    (reference: Model/train.py:126,214-216,283-286)."""
    t = cfg.train

    def schedule(step):
        if t.lr_decay_steps:
            # pifpaf-style decay at explicit boundaries (config_pifpaf.py).
            lr = t.lr_init
            factor = jnp.ones((), jnp.float32)
            for boundary in t.lr_decay_steps:
                factor = jnp.where(step >= boundary, factor * t.lr_decay_factor, factor)
            return lr * factor
        n = jnp.floor_divide(step, t.lr_decay_every_step)
        return t.lr_init * jnp.power(t.lr_decay_factor, n.astype(jnp.float32))

    return schedule


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    sched = staged_lr_schedule(cfg)
    kind = cfg.train.optim_type
    if kind == OPTIM.Adam:
        opt = optax.adam(sched)
    elif kind == OPTIM.RMSprop:
        opt = optax.rmsprop(sched)
    else:
        opt = optax.sgd(sched)
    if cfg.train.grad_clip_norm:
        # The 6-stage staged-sum L2 loss concentrates early-training
        # gradient spikes (measured NaN at lr 5e-4 bf16 by step ~1.5k);
        # global-norm clipping keeps the big models stable at useful lrs.
        opt = optax.chain(
            optax.clip_by_global_norm(cfg.train.grad_clip_norm), opt
        )
    if cfg.train.grad_accum_steps > 1:
        # Every-k-step update: params stay fixed for k-1 micro-batches while
        # grads average, giving effective batch = k * batch_size per chip.
        opt = optax.MultiSteps(opt, cfg.train.grad_accum_steps)
    return opt


def l2_regularization(params, weight_decay: float) -> jnp.ndarray:
    """Explicit L2 over kernels (reference: Model/common.py:168-173
    regulize_loss applies decay * l2 over trainable weights)."""
    leaves = jax.tree_util.tree_leaves_with_path(params)
    total = 0.0
    for path, leaf in leaves:
        name = str(path[-1].key) if hasattr(path[-1], "key") else ""
        if name == "kernel":
            total = total + jnp.sum(jnp.square(leaf))
    return weight_decay * total


class Trainer:
    """Train-loop driver for the OpenPose family.

    Handles: mesh setup, fused (targets + forward + loss + update) step,
    checkpoint/resume, metric logging, periodic weight export — the combined
    responsibilities of single_train/parallel_train in the reference.
    """

    def __init__(self, config: Config, model, limbs: np.ndarray):
        self.config = config
        self.model = model
        self.limbs = np.asarray(limbs)
        t = config.train
        avail = t.n_devices or len(jax.devices())
        # dp size must divide the global batch; use the largest that fits.
        dp_max = max(avail // t.spatial_parallel, 1)
        dp = max(d for d in range(1, dp_max + 1) if t.batch_size % d == 0)
        self.mesh = make_mesh(
            n_devices=dp * t.spatial_parallel, spatial=t.spatial_parallel
        )
        self.optimizer = make_optimizer(config)
        self.metric_manager = MetricManager()
        self.ckpt = CheckpointManager(config.model.model_dir)
        self._step_fn = None
        # Adversarial domain adaptation (reference: Model/train.py:230-262
        # optimize_step_dmadapt + domainadapt.py Discriminator).
        self.domainadapt = bool(config.data.domainadapt_flag)
        if self.domainadapt:
            from .domainadapt import Discriminator

            self.discriminator = Discriminator()
            self.d_optimizer = optax.adam(staged_lr_schedule(config))

    # -- jitted step ---------------------------------------------------------

    def _build_step(self):
        cfg = self.config
        model = self.model
        limbs = self.limbs
        in_hw = (cfg.model.hin, cfg.model.win)
        out_hw = (cfg.model.hout, cfg.model.wout)
        wd = cfg.train.weight_decay_factor
        rep = replicated(self.mesh)
        bsh = batch_sharding(self.mesh)           # [B, H, W, C] images/masks
        bsh_row = NamedSharding(self.mesh, P("dp"))  # batch-only tensors
        optimizer = self.optimizer

        targets_loss = self._family_targets_loss(cfg, model, limbs, in_hw,
                                                 out_hw)

        from ..config import SYNC

        dp = int(self.mesh.shape["dp"])
        if cfg.train.sync_type != SYNC.Sync_sgd and dp > 1:
            # Sync_avg / Pair_avg: per-device local steps with explicit
            # weight exchange (reference: KungFu Synchronous/PairAveraging
            # optimizers, Model/train.py:512-522).
            from ..parallel.sync_modes import make_local_step_train_fn

            mode = ("sync_avg" if cfg.train.sync_type == SYNC.Sync_avg
                    else "pair_avg")

            def loss_fn(predict, tgt):
                return targets_loss(
                    predict, tgt["kpts"], tgt["valid"], tgt["mask"],
                    tgt["bbxs"],
                )

            inner = make_local_step_train_fn(
                model, loss_fn, optimizer, self.mesh, mode,
                preprocess=lambda im: im.astype(model.dtype) / 255.0,
            )

            def sync_step(params, batch_stats, opt_state, images, kpts,
                          valid, mask, bbxs, step_i):
                tgt = {"kpts": kpts, "valid": valid, "mask": mask,
                       "bbxs": bbxs}
                return inner(params, batch_stats, opt_state, images, tgt,
                             step_i)

            self._step_takes_index = True
            return sync_step

        self._step_takes_index = False

        if self.domainadapt:
            return self._build_dmadapt_step(
                targets_loss, model, wd, optimizer, rep, bsh, bsh_row
            )

        def step(params, batch_stats, opt_state, images, kpts, valid, mask,
                 bbxs):
            def loss_wrapped(p):
                variables = {"params": p, "batch_stats": batch_stats}
                x = images.astype(model.dtype) / 255.0
                predict, updates = model.apply(
                    variables, x, train=True, mutable=["batch_stats"]
                )
                pd_loss, parts = targets_loss(
                    predict, kpts, valid, mask, bbxs
                )
                re_loss = l2_regularization(p, wd)
                total = pd_loss + re_loss
                parts = dict(parts, loss_re=re_loss, pd_loss=pd_loss)
                return total, (parts, updates["batch_stats"])

            (loss, (parts, new_stats)), grads = jax.value_and_grad(
                loss_wrapped, has_aux=True
            )(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, new_stats, opt_state, dict(parts, total_loss=loss)

        return jax.jit(
            step,
            in_shardings=(rep, rep, rep, bsh, bsh_row, bsh_row, bsh, bsh_row),
            out_shardings=(rep, rep, rep, rep),
            donate_argnums=(0, 1, 2),
        )

    def _build_dmadapt_step(self, targets_loss, model, wd, optimizer, rep,
                            bsh, bsh_row):
        """One fused step: pose loss + adversarial generator loss on the
        backbone, then a discriminator update on stop-gradient features
        (reference: Model/train.py:230-262,475-507 optimize_step_dmadapt —
        combined generator gradients applied by the single pose optimizer,
        discriminator trained by its own optimizer)."""
        from .domainadapt import bce_logits, discriminator_losses

        disc = self.discriminator
        d_optimizer = self.d_optimizer
        lambda_adapt = self.config.train.lambda_adapt

        def backbone_feats(p, batch_stats, x):
            out = model.apply(
                {"params": p, "batch_stats": batch_stats}, x,
                train=False, ret_backbone=True,
            )
            return out["backbone_features"].astype(jnp.float32)

        def step(params, batch_stats, opt_state, d_params, d_opt_state,
                 images, kpts, valid, mask, bbxs, unlabeled):
            x_l = images.astype(model.dtype) / 255.0
            x_u = unlabeled.astype(model.dtype) / 255.0

            def loss_wrapped(p):
                variables = {"params": p, "batch_stats": batch_stats}
                predict, updates = model.apply(
                    variables, x_l, train=True, mutable=["batch_stats"]
                )
                pd_loss, parts = targets_loss(predict, kpts, valid, mask,
                                              bbxs)
                re_loss = l2_regularization(p, wd)
                # Generator objective: unlabeled features should fool the
                # (frozen-in-this-term) discriminator.
                u_feats = backbone_feats(p, batch_stats, x_u)
                u_logits = disc.apply({"params": d_params}, u_feats)
                g_loss = bce_logits(u_logits, jnp.ones_like(u_logits))
                total = pd_loss + re_loss + lambda_adapt * g_loss
                parts = dict(parts, loss_re=re_loss, pd_loss=pd_loss,
                             g_loss=g_loss)
                return total, (parts, updates["batch_stats"])

            (loss, (parts, new_stats)), grads = jax.value_and_grad(
                loss_wrapped, has_aux=True
            )(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)

            # Discriminator update on detached features of both streams.
            l_feats = jax.lax.stop_gradient(
                backbone_feats(params, new_stats, x_l)
            )
            u_feats = jax.lax.stop_gradient(
                backbone_feats(params, new_stats, x_u)
            )

            def d_loss_fn(dp):
                ll = disc.apply({"params": dp}, l_feats)
                ul = disc.apply({"params": dp}, u_feats)
                _, d_loss = discriminator_losses(ll, ul)
                return d_loss

            d_loss, d_grads = jax.value_and_grad(d_loss_fn)(d_params)
            d_updates, d_opt_state = d_optimizer.update(
                d_grads, d_opt_state, d_params
            )
            d_params = optax.apply_updates(d_params, d_updates)
            metrics = dict(parts, total_loss=loss, d_loss=d_loss)
            return params, new_stats, opt_state, d_params, d_opt_state, metrics

        return jax.jit(
            step,
            in_shardings=(rep, rep, rep, rep, rep, bsh, bsh_row, bsh_row,
                          bsh, bsh_row, bsh),
            out_shardings=(rep,) * 6,
            donate_argnums=(0, 1, 2, 3, 4),
        )

    @staticmethod
    def _family_targets_loss(cfg, model, limbs, in_hw, out_hw):
        """On-device target generation + loss, dispatched per model family
        (replaces the reference's per-algorithm PreProcessor + cal_loss
        pairing, Model/__init__.py:312-333)."""
        from ..config import MODEL

        mt = cfg.model.model_type
        if mt == MODEL.PoseProposal:
            from ..data.targets import ppn_targets
            from ..models.pose_proposal import pose_proposal_loss

            from ..models import get_topology
            from ..utils.topology import instance_part_idx

            inst = instance_part_idx(get_topology(cfg))

            def ppn_fn(predict, kpts, valid, mask, bbxs):
                targets = ppn_targets(
                    kpts, valid, bbxs, limbs, in_hw, out_hw,
                    nei=(cfg.model.hnei, cfg.model.wnei),
                    instance_idx=inst,
                )
                return pose_proposal_loss(model, predict, targets)

            return ppn_fn

        if mt == MODEL.Pifpaf:
            from ..data.targets import pifpaf_targets
            from ..models.pifpaf import pifpaf_loss

            def pifpaf_fn(predict, kpts, valid, mask, bbxs):
                targets = pifpaf_targets(
                    kpts, valid, limbs, in_hw, out_hw, mask=mask
                )
                return pifpaf_loss(predict, targets)

            return pifpaf_fn

        # OpenPose family. Model confidence channels = parts + background;
        # the keypoint array may carry a dead background row (converter
        # convention) that must not become a target channel.
        n_parts = cfg.model.n_pos - 1

        def opps_fn(predict, kpts, valid, mask, bbxs):
            targets = openpose_targets(
                kpts[:, :, :n_parts], valid[:, :, :n_parts], limbs,
                in_hw, out_hw, mask=mask,
            )
            return openpose_loss(
                predict, targets["conf_map"], targets["paf_map"], mask
            )

        return opps_fn

    # -- loop ----------------------------------------------------------------

    def init_state(self, rng=None):
        cfg = self.config
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        dummy = jnp.zeros((1, cfg.model.hin, cfg.model.win, 3), self.model.dtype)
        variables = self.model.init(rng, dummy, train=True)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        # pretrained-backbone graft: tolerant load of the pretrain loop's
        # newest_<Backbone>.npz when present
        # (reference: Model/train.py:191-195)
        bcls = getattr(self.model, "backbone", None)
        if bcls is not None and hasattr(bcls, "__name__"):
            pre_npz = os.path.join(
                cfg.pretrain.pretrain_model_dir,
                f"newest_{bcls.__name__}.npz",
            )
            if os.path.exists(pre_npz):
                from .pretrain import load_pretrained_backbone

                grafted, n = load_pretrained_backbone(
                    {"params": params, "batch_stats": batch_stats}, pre_npz
                )
                params = grafted["params"]
                batch_stats = grafted["batch_stats"]
                logger.info(
                    "loaded pretrained backbone %s (%d tensors)", pre_npz, n
                )
        opt_state = self.optimizer.init(params)
        return params, batch_stats, opt_state

    def init_dmadapt_state(self, params, batch_stats):
        """Discriminator params/opt-state sized to the backbone features."""
        cfg = self.config
        dummy = jnp.zeros(
            (1, cfg.model.hin, cfg.model.win, 3), self.model.dtype
        )
        feats = self.model.apply(
            {"params": params, "batch_stats": batch_stats}, dummy,
            train=False, ret_backbone=True,
        )["backbone_features"].astype(jnp.float32)
        d_vars = self.discriminator.init(jax.random.PRNGKey(1), feats)
        d_params = d_vars["params"]
        return d_params, self.d_optimizer.init(d_params)

    def train(self, pipeline: TrainPipeline, n_step: int | None = None,
              visualizer=None, unlabeled_pipeline=None):
        cfg = self.config
        n_step = n_step or cfg.train.n_step
        params, batch_stats, opt_state = self.init_state()

        d_params = d_opt_state = None
        if self.domainadapt:
            if unlabeled_pipeline is None:
                raise ValueError(
                    "domainadapt_flag is set but no unlabeled_pipeline was "
                    "given (see train.domainadapt.UnlabeledPipeline)"
                )
            d_params, d_opt_state = self.init_dmadapt_state(
                params, batch_stats
            )

        start_step = 0
        state_like = {
            "params": params, "batch_stats": batch_stats,
            "opt_state": opt_state,
        }
        if self.domainadapt:
            state_like["d_params"] = d_params
            state_like["d_opt_state"] = d_opt_state
        restored_step, restored = self.ckpt.restore(state_like)
        if restored is not None:
            start_step = restored_step
            params = restored["params"]
            batch_stats = restored["batch_stats"]
            opt_state = restored["opt_state"]
            if self.domainadapt and "d_params" in restored:
                d_params = restored["d_params"]
                d_opt_state = restored["d_opt_state"]
            logger.info("resumed from step %d", start_step)

        step_fn = self._step_fn or self._build_step()
        self._step_fn = step_fn

        rep = replicated(self.mesh)
        bsh = batch_sharding(self.mesh)
        bsh_row = NamedSharding(self.mesh, P("dp"))
        params = jax.device_put(params, rep)
        batch_stats = jax.device_put(batch_stats, rep)
        opt_state = jax.device_put(opt_state, rep)
        if self.domainadapt:
            d_params = jax.device_put(d_params, rep)
            d_opt_state = jax.device_put(d_opt_state, rep)
            unlabeled_iter = iter(unlabeled_pipeline) if hasattr(
                unlabeled_pipeline, "__iter__"
            ) else unlabeled_pipeline

        mm = self.metric_manager
        log_every = cfg.log.log_interval
        save_every = cfg.train.save_interval
        vis_every = cfg.train.vis_interval

        it = iter(pipeline)
        with self.mesh:
            for step_idx in range(start_step, n_step):
                try:
                    batch = next(it)
                except StopIteration:
                    logger.info("pipeline exhausted at step %d", step_idx)
                    break
                images = jax.device_put(batch["images"], bsh)
                kpts = jax.device_put(batch["kpts"], bsh_row)
                valid = jax.device_put(batch["valid"], bsh_row)
                mask = jax.device_put(batch["mask"], bsh)
                bbxs = jax.device_put(batch["bbxs"], bsh_row)
                if self.domainadapt:
                    unlabeled = jax.device_put(
                        np.asarray(
                            next(unlabeled_iter) if hasattr(
                                unlabeled_iter, "__next__"
                            ) else unlabeled_iter.next()
                        ),
                        bsh,
                    )
                    (params, batch_stats, opt_state, d_params, d_opt_state,
                     metrics) = step_fn(
                        params, batch_stats, opt_state, d_params,
                        d_opt_state, images, kpts, valid, mask, bbxs,
                        unlabeled,
                    )
                elif getattr(self, "_step_takes_index", False):
                    params, batch_stats, opt_state, metrics = step_fn(
                        params, batch_stats, opt_state, images, kpts, valid,
                        mask, bbxs, jnp.int32(step_idx),
                    )
                else:
                    params, batch_stats, opt_state, metrics = step_fn(
                        params, batch_stats, opt_state, images, kpts, valid,
                        mask, bbxs,
                    )
                if (step_idx + 1) % log_every == 0:
                    host_metrics = {
                        k: float(v) for k, v in metrics.items()
                    }
                    mm.update_dict(host_metrics)
                    logger.info(
                        "step %d: %s [%s]", step_idx + 1,
                        mm.report_train(), mm.report_timing(log_every),
                    )
                if (
                    visualizer is not None
                    and (step_idx + 1) % vis_every == 0
                    and jax.process_index() == 0
                ):
                    self._visualize(visualizer, batch, params, batch_stats,
                                    step_idx + 1)
                if (step_idx + 1) % save_every == 0 and jax.process_index() == 0:
                    self.save(step_idx + 1, params, batch_stats, opt_state,
                              d_params, d_opt_state)
        self.save(n_step, params, batch_stats, opt_state, d_params,
                  d_opt_state)
        return params, batch_stats

    def save(self, step: int, params, batch_stats, opt_state,
             d_params=None, d_opt_state=None):
        state = {
            "params": jax.device_get(params),
            "batch_stats": jax.device_get(batch_stats),
            "opt_state": jax.device_get(opt_state),
        }
        if d_params is not None:
            # Discriminator checkpointed alongside the pose model
            # (reference: Model/train.py:202-207,322-325).
            state["d_params"] = jax.device_get(d_params)
            state["d_opt_state"] = jax.device_get(d_opt_state)
        self.ckpt.save(step, state)
        npz_path = os.path.join(
            self.config.model.model_dir, "newest_model.npz"
        )
        save_weights_npz(
            {"params": state["params"], "batch_stats": state["batch_stats"]},
            npz_path,
        )
        logger.info("saved checkpoint at step %d -> %s", step, npz_path)

    def _visualize(self, visualizer, batch, params, batch_stats, step):
        """Periodic prediction/target comparison images
        (reference: Model/train.py:303-307,567)."""
        from ..config import MODEL

        if self.config.model.model_type in (MODEL.PoseProposal, MODEL.Pifpaf):
            return  # map-grid visualization is OpenPose-family specific
        try:
            import jax.numpy as jnp

            x = jnp.asarray(batch["images"][:1]).astype(self.model.dtype) / 255.0
            out = self.model.apply(
                {"params": params, "batch_stats": batch_stats}, x, train=False
            )
            n_parts = self.config.model.n_pos - 1
            targets = openpose_targets(
                jnp.asarray(batch["kpts"][:1, :, :n_parts]),
                jnp.asarray(batch["valid"][:1, :, :n_parts]),
                self.limbs,
                (self.config.model.hin, self.config.model.win),
                (self.config.model.hout, self.config.model.wout),
            )
            visualizer.visualize_maps(
                batch["images"][0],
                np.asarray(out["conf_map"][0], dtype=np.float32),
                np.asarray(out["paf_map"][0], dtype=np.float32),
                f"train_step_{step}",
                gt_conf=np.asarray(targets["conf_map"][0]),
                gt_paf=np.asarray(targets["paf_map"][0]),
            )
        except Exception as exc:  # visualization must never kill training
            logger.warning("visualization failed at step %d: %s", step, exc)
