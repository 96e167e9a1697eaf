"""Optimizer construction from the reference's OPTIMIZER config dict.

Parity with the reference compile paths (core/models.py:3340-3387 RPN.compile,
4438-4495 HEAD.compile): SGD / Adadelta / Adam selected by
``OPTIMIZER = {"name": ..., "parameters": {...}}``; L2 weight decay
``0.5 * WEIGHT_DECAY * ||w||^2`` added for every parameter EXCEPT BatchNorm
scale/offset (the reference skips gamma/beta, core/models.py:3379-3384) —
realized as optax.add_decayed_weights with a mask (identical gradient).

Also provides:
- MaxNorm kernel projection for mrcnn_class_logits (max 2.0) and
  mrcnn_bbox_fc (max 1.0), applied post-update like Keras constraints
  (reference: core/models.py:1156-1176).
- freeze masks via optax.multi_transform (replaces the reference's
  prefix-based layer freezing, core/models.py:4626-4701).
- host-side ReduceLROnPlateau / EarlyStopping equivalents
  (reference: core/models.py:2949-3060).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax


def _normalize_params(p: dict | None) -> dict:
    p = dict(p or {})
    if "lr" in p and "learning_rate" not in p:
        p["learning_rate"] = p.pop("lr")
    if "beta1" in p:
        p["beta_1"] = p.pop("beta1")
    if "beta2" in p:
        p["beta_2"] = p.pop("beta2")
    return p


def _path_has_bn(path) -> bool:
    return any("bn" in str(getattr(k, "key", k)).lower() for k in path)


def decay_mask(params):
    """True where weight decay applies (everything except BN scale/bias)."""
    flat = jax.tree_util.tree_flatten_with_path(params)
    return jax.tree_util.tree_unflatten(
        flat[1], [not _path_has_bn(path) for path, _ in flat[0]]
    )


def _add_size_normalized_decay(wd: float) -> "optax.GradientTransformation":
    """Reference-exact L2 term: the reference divides each tensor's
    ``0.5*WD*||w||^2`` penalty by ``tf.size(w)`` (core/models.py:3380-3384),
    so the gradient contribution is ``WD * w / size(w)`` — orders of
    magnitude smaller than plain ``add_decayed_weights`` for large kernels.
    Opt-in via ``WEIGHT_DECAY_SIZE_NORMALIZED`` (see MIGRATING.md; the m3d
    default keeps the un-normalized Keras-conventional decay that every
    committed run trained with)."""

    def update_fn(updates, state, params):
        if params is None:
            raise ValueError("size-normalized decay requires params")
        mask = decay_mask(params)

        def add(g, w, m):
            if not m:
                return g
            return g + (wd / float(np.prod(w.shape))) * w.astype(g.dtype)

        return jax.tree_util.tree_map(add, updates, params, mask), state

    return optax.GradientTransformation(lambda params: optax.EmptyState(),
                                        update_fn)


def _keras_iteration_decay(decay: float) -> "optax.GradientTransformation":
    """Keras-1.x/2.x SGD ``decay``: ``lr_t = lr / (1 + decay * iterations)``
    (the reference's rats RPN config passes ``decay: 1e-4``,
    configs/rpn/scp_rpn_rats.json). Realized as a post-lr multiplicative
    schedule so it composes with the injected, host-mutable base lr."""
    return optax.scale_by_schedule(lambda count: 1.0 / (1.0 + decay * count))


# OPTIMIZER.parameters keys each optimizer consumes (after _normalize_params
# aliasing); anything else is warned about instead of silently dropped.
_KNOWN_PARAMS = {
    "sgd": {"learning_rate", "momentum", "nesterov", "clipnorm", "decay"},
    "adadelta": {"learning_rate", "rho", "epsilon", "clipnorm", "decay"},
    "adam": {"learning_rate", "beta_1", "beta_2", "epsilon", "clipnorm",
             "decay"},
    "adamw": {"learning_rate", "beta_1", "beta_2", "epsilon", "clipnorm",
              "decay"},
}


def _clip_by_leaf_norm(max_norm: float) -> "optax.GradientTransformation":
    """Keras ``clipnorm`` semantics: clip EACH gradient tensor to L2 norm
    ``max_norm`` independently (tf.keras.optimizers clipnorm; the reference
    passes it per-optimizer in OPTIMIZER.parameters)."""

    def update_fn(updates, state, params=None):
        del params

        def clip_leaf(g):
            n = jnp.sqrt(jnp.sum(jnp.square(g.astype(jnp.float32))))
            scale = jnp.minimum(1.0, max_norm / jnp.maximum(n, 1e-12))
            return (g.astype(jnp.float32) * scale).astype(g.dtype)

        return jax.tree_util.tree_map(clip_leaf, updates), state

    return optax.GradientTransformation(lambda params: optax.EmptyState(),
                                        update_fn)


def build_optimizer(config, params=None, learning_rate=None,
                    freeze_predicate=None):
    """Returns an optax.GradientTransformation.

    freeze_predicate: optional fn(path_str) -> bool; frozen params get zero
    updates (used by HEAD e2e training to freeze backbone/FPN/RPN,
    reference: core/models.py:4626-4701).
    """
    spec = getattr(config, "OPTIMIZER", {"name": "SGD", "parameters": {}})
    name = str(spec.get("name", "SGD")).lower()
    p = _normalize_params(spec.get("parameters"))
    lr = float(learning_rate if learning_rate is not None
               else p.get("learning_rate", 0.01))

    # learning_rate is injected as an optimizer-state hyperparam so the
    # host-side ReduceLROnPlateau can change it between steps WITHOUT
    # recompiling the jitted train step (the reference mutates the Keras
    # optimizer's lr variable the same way, core/models.py:3024-3060).
    if name == "sgd":
        def base_fn(learning_rate):
            return optax.sgd(learning_rate,
                             momentum=float(p.get("momentum", 0.9)),
                             nesterov=bool(p.get("nesterov", False)))
    elif name == "adadelta":
        lr = lr if "learning_rate" in p else 1.0

        def base_fn(learning_rate):
            return optax.adadelta(learning_rate,
                                  rho=float(p.get("rho", 0.95)),
                                  eps=float(p.get("epsilon", 1e-7)))
    elif name in ("adam", "adamw"):
        def base_fn(learning_rate):
            return optax.adam(learning_rate,
                              b1=float(p.get("beta_1", 0.9)),
                              b2=float(p.get("beta_2", 0.999)),
                              eps=float(p.get("epsilon", 1e-8)))
    else:
        raise ValueError(f"unsupported optimizer: {spec}")
    unknown = set(p) - _KNOWN_PARAMS.get(name, set())
    if unknown:
        print(f"[build_optimizer] WARNING: OPTIMIZER.parameters keys "
              f"{sorted(unknown)} are not supported for {name!r} and are "
              f"ignored")
    base = optax.inject_hyperparams(base_fn)(learning_rate=lr)

    wd = float(getattr(config, "WEIGHT_DECAY", 0.0))
    chain = []
    if wd > 0:
        if bool(getattr(config, "WEIGHT_DECAY_SIZE_NORMALIZED", False)):
            chain.append(_add_size_normalized_decay(wd))
        else:
            chain.append(optax.add_decayed_weights(wd, mask=decay_mask))
    # Keras-style per-variable clipnorm from OPTIMIZER.parameters — the
    # reference's anisotropic (rats/HeLa) configs rely on it
    # (configs/heads/scp_heads_rats.json: Adam clipnorm=5.0;
    # configs/rpn/scp_rpn_rats.json: SGD clipnorm=5.0). Silently dropping
    # it lets the first large-LR steps blow the head activations past the
    # saturating loss nonlinearities (±10 logit clip, tanh-Huber), after
    # which the class/bbox branches receive ~zero gradient forever —
    # exactly the collapse ANISO.md documents for the v2 run. Keras clips
    # each gradient tensor by its own L2 norm, so this is per-leaf, not
    # global.
    clipnorm = float(p.get("clipnorm", 0.0) or 0.0)
    if clipnorm > 0:
        chain.append(_clip_by_leaf_norm(clipnorm))
    clip = float(getattr(config, "GRADIENT_CLIP_NORM", 0.0) or 0.0)
    if clip > 0:
        chain.append(optax.clip_by_global_norm(clip))
    chain.append(base)
    decay = float(p.get("decay", 0.0) or 0.0)
    if decay > 0:
        chain.append(_keras_iteration_decay(decay))
    tx = optax.chain(*chain)

    if freeze_predicate is not None:
        def label_fn(params):
            flat = jax.tree_util.tree_flatten_with_path(params)
            labels = []
            for path, _ in flat[0]:
                pstr = "/".join(str(getattr(k, "key", k)) for k in path)
                labels.append("frozen" if freeze_predicate(pstr) else "train")
            return jax.tree_util.tree_unflatten(flat[1], labels)

        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()}, label_fn
        )
    return tx


# ----------------------------------------------------------------------
# Keras-style MaxNorm constraints as a post-step projection
# ----------------------------------------------------------------------
_MAXNORM = {"mrcnn_class_logits": 2.0, "mrcnn_bbox_fc": 1.0}


def apply_constraints(params, frozen_predicate=None):
    """Project Dense kernels to their max column norms (Keras MaxNorm parity:
    the norm is over the input axis, per output unit).

    ``frozen_predicate``: optional fn(path_str) -> bool; frozen params are
    left untouched — Keras applies constraints only when a weight is
    updated, so frozen layers must not be projected.
    """

    def visit(path, leaf):
        names = [str(getattr(k, "key", k)) for k in path]
        if names[-1] != "kernel":
            return leaf
        if frozen_predicate is not None and frozen_predicate("/".join(names)):
            return leaf
        for module, max_norm in _MAXNORM.items():
            if module in names:
                norm = jnp.sqrt(jnp.sum(leaf * leaf, axis=0, keepdims=True))
                scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-7))
                return leaf * scale
        return leaf

    return jax.tree_util.tree_map_with_path(visit, params)


# ----------------------------------------------------------------------
# Host-side schedule callbacks (reference: core/models.py:2949-3060)
# ----------------------------------------------------------------------
class ReduceLROnPlateau:
    def __init__(self, factor=0.5, patience=3, min_lr=1e-6, mode="min"):
        self.factor, self.patience, self.min_lr = factor, patience, min_lr
        self.mode = mode
        self.best = np.inf if mode == "min" else -np.inf
        self.wait = 0

    def update(self, metric, lr):
        improved = (metric < self.best) if self.mode == "min" else (metric > self.best)
        if improved:
            self.best, self.wait = metric, 0
            return lr
        self.wait += 1
        if self.wait >= self.patience:
            self.wait = 0
            new_lr = max(self.min_lr, lr * self.factor)
            if new_lr < lr:
                print(f"[ReduceLROnPlateau] lr {lr:.2e} -> {new_lr:.2e}")
            return new_lr
        return lr


class EarlyStopping:
    def __init__(self, patience=10, mode="min", min_delta=0.0):
        self.patience, self.mode, self.min_delta = patience, mode, min_delta
        self.best = np.inf if mode == "min" else -np.inf
        self.wait = 0
        self.stopped = False

    def update(self, metric):
        improved = (
            metric < self.best - self.min_delta
            if self.mode == "min"
            else metric > self.best + self.min_delta
        )
        if improved:
            self.best, self.wait = metric, 0
        else:
            self.wait += 1
            if self.wait >= self.patience:
                self.stopped = True
        return self.stopped


def get_learning_rate(opt_state) -> float:
    """Current injected learning rate (see build_optimizer)."""
    import optax.tree_utils as otu

    return float(otu.tree_get(opt_state, "learning_rate"))


def set_learning_rate(opt_state, lr: float):
    """Functionally replace the injected learning rate in an opt state."""
    import optax.tree_utils as otu

    return otu.tree_set(opt_state,
                        learning_rate=jnp.asarray(lr, jnp.float32))
