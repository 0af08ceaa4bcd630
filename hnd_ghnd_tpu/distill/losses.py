"""Distillation criteria from the reference YAML criterion schema.

Parity surface: src/distillation/loss.py (GeneralizedCustomLoss = weighted
sum of per-term criteria over (teacher_output, student_output) pairs +
optional org_loss_factor x task loss; skipped when the factor is 0 —
essential because with distill_backbone_only the "org loss dict" is a
feature dict, SURVEY.md §2.5) and the myutils ``func_util.get_loss``
surface (torch.nn.<type>(**params); configs use MSELoss(reduction='sum')).

HND = one term (layer1); GHND = four terms (layer1..layer4).  The only
difference between the two methods is this config block.
"""
from __future__ import annotations

from typing import Any, Callable, Dict

import jax.numpy as jnp


def _reduce(x: jnp.ndarray, reduction: str) -> jnp.ndarray:
    if reduction == "sum":
        return x.sum()
    if reduction == "mean":
        return x.mean()
    if reduction == "none":
        return x
    raise ValueError(f"unknown reduction `{reduction}`")


def mse_loss(reduction: str = "mean") -> Callable:
    def fn(target, pred):
        d = (target.astype(jnp.float32) - pred.astype(jnp.float32))
        return _reduce(d * d, reduction)
    return fn


def l1_loss(reduction: str = "mean") -> Callable:
    def fn(target, pred):
        return _reduce(jnp.abs(target.astype(jnp.float32)
                               - pred.astype(jnp.float32)), reduction)
    return fn


def smooth_l1_loss(reduction: str = "mean", beta: float = 1.0) -> Callable:
    def fn(target, pred):
        d = jnp.abs(target.astype(jnp.float32) - pred.astype(jnp.float32))
        v = jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)
        return _reduce(v, reduction)
    return fn


ELEMENTWISE_LOSSES = {
    "MSELoss": mse_loss,
    "L1Loss": l1_loss,
    "SmoothL1Loss": smooth_l1_loss,
}


def get_elementwise_loss(loss_type: str, params: Dict[str, Any]) -> Callable:
    if loss_type not in ELEMENTWISE_LOSSES:
        raise KeyError(f"loss type `{loss_type}` is not expected")
    return ELEMENTWISE_LOSSES[loss_type](**(params or {}))


class GeneralizedCustomLoss:
    """Callable over (output_dict, org_loss_dict).

    output_dict: {term_name: (teacher_tensor, student_tensor)}.
    org_loss_dict: the student's task-loss dict (ignored when
    org_loss_factor == 0).
    """

    def __init__(self, criterion_config: Dict[str, Any]):
        self.org_loss_factor = float(
            criterion_config.get("params", {}).get("org_loss_factor", 0.0))
        self.terms = {}
        for name, term_cfg in criterion_config["terms"].items():
            sub = term_cfg["criterion"]
            fn = get_elementwise_loss(sub["type"], sub.get("params"))
            self.terms[name] = (tuple(term_cfg["ts_modules"]), fn,
                                float(term_cfg["factor"]))

    def __call__(self, output_dict, org_loss_dict=None):
        loss_dict = {}
        for name, (t_out, s_out) in output_dict.items():
            _, fn, factor = self.terms[name]
            loss_dict[name] = fn(t_out, s_out) * factor
        total = sum(loss_dict.values())
        if self.org_loss_factor != 0 and org_loss_dict:
            total = total + self.org_loss_factor * sum(org_loss_dict.values())
        return total, loss_dict


LOSS_DICT = {"general": GeneralizedCustomLoss}


def get_loss(criterion_config: Dict[str, Any]) -> GeneralizedCustomLoss:
    ctype = criterion_config["type"]
    if ctype not in LOSS_DICT:
        raise ValueError(f"criterion type `{ctype}` is not expected")
    return LOSS_DICT[ctype](criterion_config)
