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
