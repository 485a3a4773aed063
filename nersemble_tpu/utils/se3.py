"""SE(3)/SO(3) exponential maps in JAX.

Batch screw-axis (6-vector ``[v, r]``: translational part first, then
rotational, matching the reference's vendored pytorch3d convention,
reference: src/nersemble/util/pytorch3d.py:10-191) to rigid transforms.

Implemented with closed-form cross/outer-product identities instead of 3x3
matmuls: exact in f32 (JAX matmuls default to low precision on TPU) and purely
elementwise on the VPU. Safe at ``|r| -> 0`` via Taylor fallbacks guarded with
the double-where trick so gradients stay finite.
"""

import jax.numpy as jnp

_EPS = 1e-8


def hat(v: jnp.ndarray) -> jnp.ndarray:
    """Batch skew-symmetric matrices from [..., 3] vectors."""
    zeros = jnp.zeros_like(v[..., 0])
    return jnp.stack([
        jnp.stack([zeros, -v[..., 2], v[..., 1]], axis=-1),
        jnp.stack([v[..., 2], zeros, -v[..., 0]], axis=-1),
        jnp.stack([-v[..., 1], v[..., 0], zeros], axis=-1),
    ], axis=-2)


def _coeffs(r):
    """cos(t), a=sin(t)/t, b=(1-cos(t))/t^2, c=(t-sin(t))/t^3 for [..., 3] r.

    All coefficients are expressed as functions of ``t2 = |r|^2`` with Taylor
    fallbacks below ``t2 < _EPS`` (double-where guarded), so gradients are
    finite at the identity — critical because the deformation field is
    initialized to (near-)zero screws (reference: deformation_field.py:72-75).
    """
    t2 = jnp.sum(r * r, axis=-1)
    small = t2 < _EPS
    t2_safe = jnp.where(small, 1.0, t2)
    theta = jnp.sqrt(t2_safe)
    cos = jnp.where(small, 1.0 - t2 / 2.0 + t2 * t2 / 24.0, jnp.cos(theta))
    a = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(theta)) / t2_safe)
    c = jnp.where(small, 1.0 / 6.0 - t2 / 120.0,
                  (theta - jnp.sin(theta)) / (theta * t2_safe))
    return cos, a, b, c, t2


def so3_exp_map(r: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula: [..., 3] axis-angle -> [..., 3, 3] rotations.

    Uses ``R = cos(t) I + a K + b r r^T`` (with ``K = hat(r)``), which follows
    from ``K^2 = r r^T - t^2 I`` — no matmul, exact in f32.
    """
    cos, a, b, _, _ = _coeffs(r)
    K = hat(r)
    outer = r[..., :, None] * r[..., None, :]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=r.dtype), K.shape)
    return (cos[..., None, None] * eye
            + a[..., None, None] * K
            + b[..., None, None] * outer)


def se3_V_matrix(r: jnp.ndarray) -> jnp.ndarray:
    """Left-Jacobian V of SO(3): ``V = (1 - c t^2) I + b K + c r r^T``."""
    _, _, b, c, theta2 = _coeffs(r)
    K = hat(r)
    outer = r[..., :, None] * r[..., None, :]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=r.dtype), K.shape)
    return ((1.0 - c * theta2)[..., None, None] * eye
            + b[..., None, None] * K
            + c[..., None, None] * outer)


def se3_exp_map(screw: jnp.ndarray) -> jnp.ndarray:
    """[..., 6] screw axes ([v, r]) -> [..., 4, 4] rigid transforms.

    Returns standard row-major transforms (``T[..., :3, :3]`` is the rotation,
    ``T[..., :3, 3]`` the translation) — i.e. what the reference obtains after
    its ``permute(0, 2, 1)`` of the pytorch3d transposed layout
    (reference: deformation_field.py:92-93).
    """
    v, r = screw[..., :3], screw[..., 3:]
    R = so3_exp_map(r)
    _, _, b, c, theta2 = _coeffs(r)
    # t = V v computed elementwise: (1 - c t^2) v + b (r x v) + c r (r . v)
    t = ((1.0 - c * theta2)[..., None] * v
         + b[..., None] * jnp.cross(r, v)
         + c[..., None] * r * jnp.sum(r * v, axis=-1, keepdims=True))
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=screw.dtype), R.shape[:-2] + (1, 4))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def se3_apply(screw: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Apply exp(screw) to [..., 3] points without forming 4x4 matrices.

    ``exp(screw) p = cos(t) p + a (r x p) + b r (r . p) + V v`` — fully
    elementwise (cross/dot products), ideal for per-sample warps on the VPU.
    """
    v, r = screw[..., :3], screw[..., 3:]
    cos, a, b, c, theta2 = _coeffs(r)
    rotated = (cos[..., None] * points
               + a[..., None] * jnp.cross(r, points)
               + b[..., None] * r * jnp.sum(r * points, axis=-1, keepdims=True))
    t = ((1.0 - c * theta2)[..., None] * v
         + b[..., None] * jnp.cross(r, v)
         + c[..., None] * r * jnp.sum(r * v, axis=-1, keepdims=True))
    return rotated + t
