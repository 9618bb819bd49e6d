"""Optimizer/scheduler construction from config, on optax.

Mirrors the reference builder (src/trainer/optimizer/build_optimizer_scheduler.py):
Adam/SGD + MultiStepLR, optional grad clipping, optional param-wise lr
multipliers keyed by name substring (``paramwise_opt``).
"""

from __future__ import annotations

from typing import Dict, Optional

import optax

from ..utils.logger import get_root_logger


def make_lr_schedule(base_lr: float, sched_opt: Optional[Dict]):
    """MultiStepLR: lr * gamma^(#milestones passed)."""
    if not sched_opt:
        return base_lr
    stype = sched_opt.get("type", "MultiStepLR")
    if stype == "MultiStepLR":
        milestones = list(sched_opt.get("milestones", []))
        gamma = float(sched_opt.get("gamma", 0.1))
        boundaries = {int(m): gamma for m in milestones}
        return optax.piecewise_constant_schedule(base_lr, boundaries)
    if stype == "CosineLR":
        return optax.cosine_decay_schedule(base_lr,
                                           int(sched_opt["decay_steps"]),
                                           alpha=sched_opt.get("alpha", 0.0))
    raise ValueError(f"unknown scheduler type: {stype}")


def _base_tx(otype: str, lr, optim_opt: Dict) -> optax.GradientTransformation:
    if otype == "Adam":
        return optax.adam(lr, b1=optim_opt.get("betas", (0.9, 0.999))[0],
                          b2=optim_opt.get("betas", (0.9, 0.999))[1],
                          eps=float(optim_opt.get("eps", 1e-8)))
    if otype == "AdamW":
        return optax.adamw(lr, weight_decay=float(
            optim_opt.get("weight_decay", 1e-2)))
    if otype == "SGD":
        return optax.sgd(lr, momentum=float(optim_opt.get("momentum", 0.0)))
    raise ValueError(f"unknown optimizer type: {otype}")


def build_optimizer(optim_opt: Dict, sched_opt: Optional[Dict] = None,
                    clip_max_norm: Optional[float] = None,
                    mask=None) -> optax.GradientTransformation:
    otype = optim_opt.get("type", "Adam")
    base_lr = float(optim_opt.get("lr", 1e-4))
    paramwise = optim_opt.get("paramwise_opt", None)

    if paramwise:
        # per-key-substring lr multipliers
        # (reference build_optimizer_scheduler.py:11-78): a param whose
        # flattened path contains `key` uses lr * lr_mult; first match wins.
        import jax

        rules = [(r["key"], float(r.get("lr_mult", 1.0))) for r in paramwise]

        def label_tree(params):
            def label(path, _):
                pstr = jax.tree_util.keystr(path)
                for i, (key, _mult) in enumerate(rules):
                    if key in pstr:
                        return f"group{i}"
                return "default"
            return jax.tree_util.tree_map_with_path(label, params)

        transforms = {"default": _base_tx(
            otype, make_lr_schedule(base_lr, sched_opt), optim_opt)}
        for i, (_key, mult) in enumerate(rules):
            transforms[f"group{i}"] = _base_tx(
                otype, make_lr_schedule(base_lr * mult, sched_opt), optim_opt)
        tx = optax.multi_transform(transforms, label_tree)
    else:
        tx = _base_tx(otype, make_lr_schedule(base_lr, sched_opt), optim_opt)

    chain = []
    if clip_max_norm:
        chain.append(optax.clip_by_global_norm(float(clip_max_norm)))
    chain.append(tx)
    tx = optax.chain(*chain)
    if mask is not None:
        tx = optax.masked(tx, mask)
    get_root_logger().debug(
        f"optimizer built: {otype} lr={optim_opt.get('lr')} "
        f"clip={clip_max_norm} sched={sched_opt} paramwise={bool(paramwise)}")
    return tx
