"""Ranger optimizer (RAdam + Lookahead + gradient centralization) in optax.

Behavioral contract: /root/reference/encoder4editing/training/ranger.py:29-163
— defaults lr 1e-3, alpha .5, k 6, N_sma_threshold 5, betas (.95, .999),
eps 1e-5, gradient centralization on tensors with ndim > 1 (gc_conv_only=False).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


def gradient_centralization(conv_only: bool = False) -> optax.GradientTransformation:
    """Subtract the per-output-channel mean from gradients with ndim >
    threshold (reference ranger.py:50,119-120)."""
    threshold = 3 if conv_only else 1

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        def gc(g):
            if g.ndim > threshold:
                axes = tuple(range(1, g.ndim))
                return g - jnp.mean(g, axis=axes, keepdims=True)
            return g

        return jax.tree_util.tree_map(gc, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


class LookaheadState(NamedTuple):
    slow: optax.Params
    count: jnp.ndarray


def lookahead(k: int = 6, alpha: float = 0.5) -> optax.GradientTransformation:
    """Lookahead as a terminal transform: every k steps, pull parameters
    toward the slow weights (reference ranger.py:156-161). Expects the
    incoming `updates` to already be final parameter deltas (post -lr)."""

    def init_fn(params):
        # copy=True: the slow weights must own distinct buffers — with
        # jnp.asarray they alias the live params, and a training step that
        # donates BOTH (params, opt_state) then donates the same buffer
        # twice (XLA aborts: "Attempt to donate the same buffer twice")
        return LookaheadState(
            slow=jax.tree_util.tree_map(
                lambda p: jnp.array(p, copy=True), params),
            count=jnp.zeros((), jnp.int32))

    def update_fn(updates, state, params):
        assert params is not None, "lookahead requires params"
        count = state.count + 1
        sync = (count % k) == 0

        def leaf(u, p, s):
            fast = p + u
            new_slow = jnp.where(sync, s + alpha * (fast - s), s)
            new_param = jnp.where(sync, new_slow, fast)
            return new_param - p, new_slow

        flat_u, tdef = jax.tree_util.tree_flatten(updates)
        flat_p = tdef.flatten_up_to(params)
        flat_s = tdef.flatten_up_to(state.slow)
        out = [leaf(u, p, s) for u, p, s in zip(flat_u, flat_p, flat_s)]
        new_updates = tdef.unflatten([o[0] for o in out])
        new_slow = tdef.unflatten([o[1] for o in out])
        return new_updates, LookaheadState(slow=new_slow, count=count)

    return optax.GradientTransformation(init_fn, update_fn)


def ranger(learning_rate, alpha: float = 0.5, k: int = 6,
           n_sma_threshold: int = 5, b1: float = 0.95, b2: float = 0.999,
           eps: float = 1e-5, weight_decay: float = 0.0,
           use_gc: bool = True, gc_conv_only: bool = False
           ) -> optax.GradientTransformation:
    parts = []
    if use_gc:
        parts.append(gradient_centralization(gc_conv_only))
    parts.append(optax.scale_by_radam(b1=b1, b2=b2, eps=eps,
                                      threshold=float(n_sma_threshold)))
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    if callable(learning_rate):
        parts.append(optax.scale_by_schedule(lambda c: -learning_rate(c)))
    else:
        parts.append(optax.scale(-learning_rate))
    parts.append(lookahead(k=k, alpha=alpha))
    return optax.chain(*parts)
