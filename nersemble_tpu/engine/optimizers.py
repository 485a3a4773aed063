"""Per-group Adam with host-scheduled step-decay learning rates.

Reference: three Adam(eps=1e-15) groups — fields / deformation_field /
embeddings — each with its own StepLR schedule
(reference: scripts/train/train_nersemble.py:243-256). On TPU we train in bf16
compute with f32 params and need no GradScaler (the reference's fp16 scaler
plumbing, nersemble_trainer.py:182-203, has no bf16 analogue).

Implementation: one optax ``scale_by_adam`` state over the whole param tree;
the group learning rate (a traced scalar per step, so LR changes never
recompile) multiplies each top-level subtree according to the model's param
groups.
"""

from typing import Dict

import jax
import jax.numpy as jnp
import optax


def make_optimizer(eps: float = 1e-15) -> optax.GradientTransformation:
    return optax.scale_by_adam(eps=eps)


def group_of_param(groups: Dict[str, list]) -> Dict[str, str]:
    """Invert {group: [top-level keys]} -> {top-level key: group}."""
    mapping = {}
    for group, keys in groups.items():
        for key in keys:
            mapping[key] = group
    return mapping


def apply_updates_with_group_lrs(params, updates, key_to_group: Dict[str, str],
                                 lrs: Dict[str, jnp.ndarray]):
    """params/updates are dicts keyed by top-level component; each component's
    adam-normalized update is scaled by its group's (traced) learning rate."""
    new_params = {}
    for key, subtree in params.items():
        lr = lrs[key_to_group[key]]
        new_params[key] = jax.tree_util.tree_map(
            lambda p, u: p - lr * u.astype(p.dtype), subtree, updates[key])
    return new_params


def fused_adam_update(params, grads, state, key_to_group: Dict[str, str],
                      lrs: Dict[str, jnp.ndarray],
                      b1: float = 0.9, b2: float = 0.999, eps: float = 1e-15):
    """Single-pass Adam: moments + bias correction + parameter apply fused
    per leaf (one read of g/mu/nu/p, one write of mu/nu/p).

    Same math as ``optax.scale_by_adam(eps=eps)`` followed by
    :func:`apply_updates_with_group_lrs`, except that bf16 gradients are
    squared in f32 for the second moment (optax squares in the gradient
    dtype; f32 matches the torch-Adam reference more closely). XLA emits ONE
    fusion per leaf instead of a moment pass plus a materialized update
    tensor plus an apply pass — worth ~20 ms/step on the flagship's 1.6 GB
    hash table (v5e). State stays ``optax.ScaleByAdamState``
    (checkpoint-compatible).
    """
    t = state.count + 1
    c1 = 1.0 - b1 ** t.astype(jnp.float32)
    c2 = 1.0 - b2 ** t.astype(jnp.float32)

    def upd(lr, p, g, mu, nu):
        g32 = g.astype(jnp.float32)
        mu2 = b1 * mu + (1.0 - b1) * g32
        nu2 = b2 * nu + (1.0 - b2) * jnp.square(g32)
        u = (mu2 / c1) / (jnp.sqrt(nu2 / c2) + eps)
        return p - lr * u.astype(p.dtype), mu2, nu2

    new_params, new_mu, new_nu = {}, {}, {}
    for key, subtree in params.items():
        lr = lrs[key_to_group[key]]
        out = jax.tree_util.tree_map(
            lambda p, g, mu, nu: upd(lr, p, g, mu, nu),
            subtree, grads[key], state.mu[key], state.nu[key])
        # unzip the (p, mu, nu) leaf tuples back into three subtrees
        new_params[key] = jax.tree_util.tree_map(
            lambda o: o[0], out, is_leaf=lambda o: isinstance(o, tuple))
        new_mu[key] = jax.tree_util.tree_map(
            lambda o: o[1], out, is_leaf=lambda o: isinstance(o, tuple))
        new_nu[key] = jax.tree_util.tree_map(
            lambda o: o[2], out, is_leaf=lambda o: isinstance(o, tuple))
    new_state = type(state)(count=t, mu=new_mu, nu=new_nu)
    return new_params, new_state
