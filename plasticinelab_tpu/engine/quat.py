"""Quaternion utilities (wxyz convention), batched-friendly pure jnp.

Behavioral reference: plb/engine/primitive/utils.py:7-47 (qrot, qmul, w2quat,
inv_trans). All functions operate on trailing axes so they can be freely
vmapped / broadcast; gradients are NaN-safe via the double-where trick.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["length", "qrot", "qmul", "w2quat", "quat_conj", "inv_trans"]


def length(x, eps=1e-8, axis=-1):
    """sqrt(x.x + eps) — matches reference utils.length (eps=1e-8)."""
    return jnp.sqrt(jnp.sum(x * x, axis=axis) + eps)


def qrot(q, v):
    """Rotate vector(s) v by quaternion(s) q = (w, x, y, z).

    v' = v + 2*(w*(qvec x v) + qvec x (qvec x v))  [reference utils.py:7-13]
    """
    qvec = q[..., 1:4]
    uv = jnp.cross(qvec, v)
    uuv = jnp.cross(qvec, uv)
    return v + 2.0 * (q[..., 0:1] * uv + uuv)


def qmul(q, r):
    """Hamilton product q ⊗ r, renormalized (reference utils.py:19-27)."""
    w = q[..., 0] * r[..., 0] - q[..., 1] * r[..., 1] - q[..., 2] * r[..., 2] - q[..., 3] * r[..., 3]
    x = q[..., 0] * r[..., 1] + q[..., 1] * r[..., 0] + q[..., 2] * r[..., 3] - q[..., 3] * r[..., 2]
    y = q[..., 0] * r[..., 2] - q[..., 1] * r[..., 3] + q[..., 2] * r[..., 0] + q[..., 3] * r[..., 1]
    z = q[..., 0] * r[..., 3] + q[..., 1] * r[..., 2] - q[..., 2] * r[..., 1] + q[..., 3] * r[..., 0]
    out = jnp.stack([w, x, y, z], axis=-1)
    # normalize to prevent drift/NaN (reference normalizes with plain sqrt)
    return out / jnp.sqrt(jnp.sum(out * out, axis=-1, keepdims=True))


def w2quat(axis_angle, thresh=1e-9):
    """Axis-angle (3,) -> unit quaternion; identity below |w| <= thresh.

    Matches reference utils.py:29-41 including its zero-gradient behavior at
    w ~ 0 (the identity branch carries no gradient).
    """
    dot = jnp.sum(axis_angle * axis_angle, axis=-1, keepdims=True)
    big = dot > thresh * thresh
    # NaN-safe norm: substitute 1 under the threshold so sqrt grad is finite.
    safe_dot = jnp.where(big, dot, jnp.ones_like(dot))
    w = jnp.sqrt(safe_dot)
    half = w * 0.5
    v = (axis_angle / w) * jnp.sin(half)
    rot = jnp.concatenate([jnp.cos(half), v], axis=-1)
    ident = jnp.concatenate(
        [jnp.ones_like(half), jnp.zeros_like(axis_angle)], axis=-1
    )
    return jnp.where(big, rot, ident)


def quat_conj(q):
    """Conjugate (w, -x, -y, -z), renormalized like reference inv_trans."""
    conj = q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)
    return conj / jnp.sqrt(jnp.sum(conj * conj, axis=-1, keepdims=True))


def inv_trans(pos, position, rotation):
    """World point -> primitive local frame (reference utils.py:43-47)."""
    return qrot(quat_conj(rotation), pos - position)
