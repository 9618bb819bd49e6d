"""Rate losses (reference src/losses/rate_loss.py).

All losses are pure-jax callables usable inside a jitted train step: the HiFiC
lambda switch (``lambda_A if qbpp > target else lambda_B``) becomes a traced
``jnp.where``; the per-rate-level lambda lists are gathered with the traced
``rate_ind``.  Schedules are resolved from the (host-side static) iteration via
``get_scheduled_params`` exactly like the reference (rate_loss.py:77-83).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Union

import numpy as np

import jax.numpy as jnp

from ..utils.registry import LOSS_REGISTRY


def _check_schedule(schedule: Optional[Dict]) -> None:
    if schedule is None:
        return
    assert "vals" in schedule and "steps" in schedule
    assert len(schedule["vals"]) == len(schedule["steps"]) + 1


def get_scheduled_params(param: float, schedule: Dict, step: int) -> float:
    vals, steps = schedule["vals"], schedule["steps"]
    idx = int(np.where(step < np.array(list(steps) + [step + 1]))[0][0])
    return param * vals[idx]


@LOSS_REGISTRY.register()
class RateLoss:
    def __init__(self, loss_weight: float):
        self.lamb_rate = loss_weight

    def __call__(self, bpp, **kwargs):
        return self.lamb_rate * jnp.mean(bpp)


@LOSS_REGISTRY.register()
class HificRateLoss:
    """lambda_A when quantized bpp exceeds the target, else lambda_B."""

    def __init__(self, lambda_A: float, lambda_B: float, target_rate: float,
                 lambda_schedule: Optional[Dict] = None,
                 target_rate_schedule: Optional[Dict] = None):
        assert lambda_A > lambda_B, \
            f"expected lambda_A > lambda_B, got {lambda_A} <= {lambda_B}"
        self.lambda_A = lambda_A
        self.lambda_B = lambda_B
        self.target_rate = target_rate
        _check_schedule(lambda_schedule)
        _check_schedule(target_rate_schedule)
        self.lambda_schedule = lambda_schedule
        self.target_rate_schedule = target_rate_schedule

    def schedule_mults(self, current_iter: int):
        """Host-side: resolve schedule multipliers for this iteration.  These
        are passed into the jitted step as traced scalars so schedule changes
        never retrigger compilation."""
        lm = get_scheduled_params(1.0, self.lambda_schedule, current_iter) \
            if self.lambda_schedule else 1.0
        tm = get_scheduled_params(1.0, self.target_rate_schedule,
                                  current_iter) \
            if self.target_rate_schedule else 1.0
        return lm, tm

    def __call__(self, bpp, qbpp, lambda_mult=1.0, target_mult=1.0, **kwargs):
        la = self.lambda_A * lambda_mult
        lb = self.lambda_B * lambda_mult
        tgt = self.target_rate * target_mult
        qbpp_mean = jnp.mean(jax_stop_gradient(qbpp))
        weight = jnp.where(qbpp_mean > tgt, la, lb)
        return weight * jnp.mean(bpp)


@LOSS_REGISTRY.register()
class HificVariableRateLoss(HificRateLoss):
    """Per-rate-level lambda_A/lambda_B/target lists indexed by rate_ind."""

    def __init__(self, lambda_A: List[float],
                 lambda_B: Union[List[float], float],
                 target_rate: List[float],
                 lambda_schedule: Optional[Dict] = None,
                 target_rate_schedule: Optional[Dict] = None):
        if isinstance(lambda_B, float):
            lambda_B = [lambda_B] * len(lambda_A)
        assert len(lambda_A) == len(lambda_B) == len(target_rate)
        assert sorted(target_rate) == list(target_rate)
        assert sorted(lambda_A, reverse=True) == list(lambda_A)
        for a, b in zip(lambda_A, lambda_B):
            assert a > b
        self.lambda_A = list(lambda_A)
        self.lambda_B = list(lambda_B)
        self.target_rate = list(target_rate)
        _check_schedule(lambda_schedule)
        _check_schedule(target_rate_schedule)
        self.lambda_schedule = lambda_schedule
        self.target_rate_schedule = target_rate_schedule

    def __call__(self, bpp, qbpp, rate_ind, lambda_mult=1.0, target_mult=1.0,
                 **kwargs):
        idx = jnp.asarray(rate_ind).reshape(-1)[0].astype(jnp.int32)
        la = jnp.take(jnp.asarray(self.lambda_A), idx) * lambda_mult
        lb = jnp.take(jnp.asarray(self.lambda_B), idx) * lambda_mult
        tgt = jnp.take(jnp.asarray(self.target_rate), idx) * target_mult
        qbpp_mean = jnp.mean(jax_stop_gradient(qbpp))
        weight = jnp.where(qbpp_mean > tgt, la, lb)
        return weight * jnp.mean(bpp)


def jax_stop_gradient(x):
    from jax import lax

    return lax.stop_gradient(jnp.asarray(x))
