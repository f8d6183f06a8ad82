"""Optimizer + LR schedule (optax) — equivalents of
`softgroup/util/optim.py:4-9` (reflection over torch.optim) and
`cosine_lr_after_step` (`softgroup/util/utils.py:55-63`), plus parameter
freezing for `fixed_modules` (reference freezes via requires_grad=False,
`softgroup/model/softgroup.py:81-84`)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def cosine_after_step_schedule(base_lr: float, step_epoch: int,
                               total_epochs: int, steps_per_epoch: int):
    """Constant lr until `step_epoch`, then cosine decay to 0 at the end of
    training; `clip(epoch - step_epoch, 0)` cosine exactly as the
    reference."""

    def schedule(step):
        epoch = step / max(steps_per_epoch, 1)
        t = jnp.clip(epoch - step_epoch, 0.0, None)
        span = max(total_epochs - step_epoch, 1)
        return base_lr * 0.5 * (1.0 + jnp.cos(jnp.pi * t / span))

    return schedule


def build_optimizer(params, cfg, schedule) -> optax.GradientTransformation:
    """cfg: dict(type='Adam'|'AdamW'|'SGD', lr=..., [weight_decay, momentum]).
    Mirrors the reference's by-name torch.optim construction."""
    otype = cfg.get('type', 'Adam').lower()
    kw = {k: v for k, v in cfg.items() if k not in ('type', 'lr')}
    if otype == 'adam':
        tx = optax.adam(schedule, **{k: v for k, v in kw.items()
                                     if k in ('b1', 'b2', 'eps')})
    elif otype == 'adamw':
        tx = optax.adamw(schedule, weight_decay=kw.get('weight_decay', 1e-2))
    elif otype == 'sgd':
        tx = optax.sgd(schedule, momentum=kw.get('momentum', 0.9))
    else:
        raise ValueError(f'unknown optimizer {cfg.get("type")}')
    return tx


def freeze_mask(params, fixed_modules) -> dict:
    """Pytree of bools: False for params under any fixed top-level module."""
    def mark(path, _):
        top = path[0].key if path else None
        return not any(str(top) == m for m in fixed_modules)
    return jax.tree_util.tree_map_with_path(mark, params)


def masked_optimizer(tx, params, fixed_modules):
    if not fixed_modules:
        return tx
    mask = freeze_mask(params, fixed_modules)
    return optax.chain(
        optax.masked(tx, mask),
        optax.masked(optax.set_to_zero(),
                     jax.tree.map(lambda m: not m, mask)),
    )


def clip_by_global_norm(max_norm: float | None):
    if not max_norm:
        return optax.identity()
    return optax.clip_by_global_norm(max_norm)
