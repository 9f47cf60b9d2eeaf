"""Optimizer factory covering every reference training recipe (see
`geovpr.core.config.OptimConfig` for the recipe -> reference citations).

Built on optax with three composable pieces:

1. base transform: AdamW (lr injected as a mutable hyperparam so host-side
   plateau scheduling can scale it without recompiling),
2. parameter partitioning: backbone vs head label tree for differential LR
   (`backbone_lr_scale`), frozen-backbone (`set_to_zero`), and
   no-weight-decay masks on bias/norm params,
3. schedules: constant / cosine / cosine-with-warm-restarts computed in the
   transform; "plateau" is a host-driven scale factor (the reference's
   ReduceLROnPlateau is inherently data-dependent control flow — it lives
   outside jit, mutating the injected hyperparam).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax

from geovpr.core.config import OptimConfig


def _is_backbone(path: tuple) -> bool:
    return len(path) > 0 and str(getattr(path[0], "key", path[0])) == "backbone"


def _is_no_decay(path: tuple) -> bool:
    leaf = str(getattr(path[-1], "key", path[-1]))
    return leaf in ("bias", "scale", "gamma", "cls_token", "pos_embed",
                    "relative_position_bias_table", "dustbin")


def param_labels(params: Any) -> Any:
    """Label tree: 'backbone' / 'head' per leaf."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: "backbone" if _is_backbone(path) else "head", params)


def decay_mask(params: Any) -> Any:
    """True where weight decay applies (excludes bias/norm/scale params —
    the reference's no-decay split, dino_v2_gemini.py:169-184)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: not _is_no_decay(path), params)


def make_schedule(cfg: OptimConfig, base_lr: float, total_steps: int,
                  steps_per_epoch: int = 0) -> optax.Schedule:
    if cfg.schedule in ("constant", "plateau"):
        return optax.constant_schedule(base_lr)
    if cfg.schedule == "cosine":
        steps = cfg.cosine_steps or max(total_steps, 1)
        return optax.cosine_decay_schedule(base_lr, steps)
    if cfg.schedule == "cosine_restarts":
        # restart_period counts EPOCHS (the reference steps its
        # CosineAnnealingWarmRestarts once per epoch,
        # swin_angle_finetuning_gemini.py:188,229) — convert to optimizer
        # steps, which tick once per batch here
        period = max(cfg.restart_period, 1) * max(steps_per_epoch, 1)
        n = max(-(-total_steps // period), 1)
        return optax.join_schedules(
            [optax.cosine_decay_schedule(base_lr, period)] * n,
            boundaries=[period * (i + 1) for i in range(n - 1)])
    raise ValueError(f"unknown schedule {cfg.schedule!r}")


def _backbone_mask(params: Any) -> Any:
    return jax.tree_util.tree_map_with_path(
        lambda path, _: _is_backbone(path), params)


def build_optimizer(cfg: OptimConfig,
                    params: Any = None,
                    total_steps: int = 0,
                    steps_per_epoch: int = 0) -> optax.GradientTransformation:
    """Build the full gradient transformation (`params` is unused — the
    transform is parameter-tree-agnostic; kept for call-site compatibility).

    The returned transform expects an `lr_scale` hyperparam accessible via
    `optax.tree_utils` paths when schedule == "plateau"; use
    `set_lr_scale(opt_state, factor)` to adjust it.
    """
    del params
    if cfg.optimizer not in ("adamw", "adam"):
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")

    chain = []
    if _has_frozen(cfg):
        # zero backbone grads BEFORE clipping so the global norm sees only
        # trainable params — the reference's frozen params produce no grads
        # at all (dinov2salad_finetuning.py:25-26), so its clip norm is
        # head-only too
        chain.append(optax.masked(optax.set_to_zero(), _backbone_mask))
    if cfg.grad_clip_norm > 0:
        chain.append(optax.clip_by_global_norm(cfg.grad_clip_norm))

    schedule = make_schedule(cfg, cfg.lr, total_steps, steps_per_epoch)

    def make_tx(lr_factor: float) -> optax.GradientTransformation:
        inner = [optax.scale_by_adam()]
        if cfg.optimizer == "adamw":
            # torch AdamW decays every parameter (the reference recipes,
            # e.g. swin_attempt_2.py:157); the bias/norm no-decay split is
            # opt-in (dino_v2_gemini.py:169-184)
            mask = decay_mask if cfg.no_decay_on_bias_norm else None
            inner.append(optax.add_decayed_weights(cfg.weight_decay,
                                                   mask=mask))
        inner.append(optax.scale_by_schedule(
            lambda step: -schedule(step) * lr_factor))
        return optax.chain(*inner)

    if cfg.backbone_lr_scale == 1.0 and not _has_frozen(cfg):
        tx = make_tx(1.0)
    else:
        backbone_factor = 0.0 if _has_frozen(cfg) else cfg.backbone_lr_scale
        tx = optax.multi_transform(
            {"backbone": (optax.set_to_zero() if backbone_factor == 0.0
                          else make_tx(backbone_factor)),
             "head": make_tx(1.0)},
            param_labels)

    chain.append(tx)
    base = optax.chain(*chain)
    # wrap with a mutable global LR scale for host-driven plateau scheduling
    return _with_lr_scale(base)


def _has_frozen(cfg: OptimConfig) -> bool:
    return cfg.backbone_lr_scale == 0.0


def _with_lr_scale(inner: optax.GradientTransformation):
    """Adds a float32 `lr_scale` leaf to the state, multiplied into every
    update. Host code mutates it for ReduceLROnPlateau semantics
    (swin_attempt_2.py:159) without recompiling the step."""

    def init(params):
        return {"inner": inner.init(params),
                "lr_scale": jnp.asarray(1.0, jnp.float32)}

    def update(updates, state, params=None):
        new_updates, new_inner = inner.update(updates, state["inner"], params)
        scale = state["lr_scale"]
        new_updates = jax.tree_util.tree_map(lambda u: u * scale, new_updates)
        return new_updates, {"inner": new_inner, "lr_scale": scale}

    return optax.GradientTransformation(init, update)


def get_lr_scale(opt_state) -> float:
    return float(opt_state["lr_scale"])


def set_lr_scale(opt_state, value: float):
    """Functional update of the plateau LR scale (host side)."""
    return {**opt_state, "lr_scale": jnp.asarray(value, jnp.float32)}
