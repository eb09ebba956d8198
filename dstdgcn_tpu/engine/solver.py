"""Per-parameter-group optimizer builder.

Capability parity with the reference's ``solver/build.py:10-22`` (vestigial
there — defined but never imported), re-expressed with optax: parameters
whose leaf name matches the bias predicate get ``lr * bias_lr_factor`` and
their own weight decay, everything else gets the base settings.  Weight
decay is L2-added-to-gradient (torch-style), i.e. applied before the
optimizer update.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import optax

__all__ = ["make_optimizer"]

_OPTIMIZERS: Dict[str, Callable[..., optax.GradientTransformation]] = {
    "adam": lambda lr, momentum: optax.adam(lr),
    "adamw": lambda lr, momentum: optax.adam(lr),  # decay handled separately
    "sgd": lambda lr, momentum: optax.sgd(lr, momentum=momentum or None),
    "rmsprop": lambda lr, momentum: optax.rmsprop(lr,
                                                  momentum=momentum or None),
}


def _is_bias(path) -> bool:
    leaf = path[-1]
    key = getattr(leaf, "key", getattr(leaf, "name", str(leaf)))
    return "bias" in str(key) or str(key) == "b"


def make_optimizer(cfg: Dict[str, Any],
                   params=None) -> optax.GradientTransformation:
    """Build an optimizer with a separate bias parameter group.

    ``cfg`` keys (reference SOLVER block): ``optimizer_name``, ``base_lr``,
    ``bias_lr_factor``, ``weight_decay``, ``weight_decay_bias``,
    ``momentum``.  ``params`` is the parameter pytree used to derive the
    group masks; pass ``None`` to derive them lazily from the params seen at
    ``tx.init`` time (lets the engine build the optimizer before the model).

    ``base_lr`` may be a traced scalar so the whole thing composes with
    ``optax.inject_hyperparams`` for per-epoch schedules (how the engine's
    ``engine.solver`` config block consumes it).
    """
    name = str(cfg.get("optimizer_name", "adam")).lower()
    base_lr = cfg.get("base_lr", 1e-3)
    bias_factor = float(cfg.get("bias_lr_factor", 1.0))
    wd = float(cfg.get("weight_decay", 0.0))
    wd_bias = float(cfg.get("weight_decay_bias", wd))
    momentum = float(cfg.get("momentum", 0.0))
    try:
        make = _OPTIMIZERS[name]
    except KeyError:
        raise ValueError(f"unknown optimizer {name!r}") from None

    import jax

    def label_tree(tree):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: "bias" if _is_bias(path) else "base", tree)

    labels = label_tree if params is None else label_tree(params)

    def group(lr: float, decay: float) -> optax.GradientTransformation:
        tx = make(lr, momentum)
        if decay > 0:
            tx = optax.chain(optax.add_decayed_weights(decay), tx)
        return tx

    return optax.multi_transform(
        {"base": group(base_lr, wd),
         "bias": group(base_lr * bias_factor, wd_bias)},
        labels)
