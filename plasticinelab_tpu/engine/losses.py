"""Task losses: density L1 + goal-SDF mass + manipulator contact; IoU metric.

Behavioral reference: plb/engine/losses/loss.py. The goal-SDF precompute
(update_target_sdf's 2*n_grid propagation sweeps, loss.py:81-106) is replaced
by an exact Euclidean distance transform on the host — the sweeps are an
iterative approximation of exactly this quantity (distance from every cell
center to the nearest occupied cell center).
"""
from __future__ import annotations

from typing import Dict, NamedTuple

import jax.numpy as jnp
import numpy as np

from ..config.spec import SceneSpec
from . import primitives as prim
from .mpm import compute_grid_m
from .state import SimState

__all__ = ["LossState", "precompute_target_sdf", "loss_and_components", "iou"]


class LossState(NamedTuple):
    """Static per-task goal tensors (device-resident, replicated)."""

    target_density: jnp.ndarray  # (G^3,)
    target_sdf: jnp.ndarray      # (G^3,)


def precompute_target_sdf(target_density: np.ndarray, dx: float,
                          threshold: float = 1e-4) -> np.ndarray:
    """Exact EDT from every cell center to the nearest occupied cell center
    (occupied = density > threshold). Units: world space (indices * dx)."""
    from scipy import ndimage

    occupied = np.asarray(target_density) > threshold
    if not occupied.any():
        return np.full(target_density.shape, 1000.0, dtype=np.float64)
    dist = ndimage.distance_transform_edt(~occupied) * dx
    return dist


def make_loss_state(scene: SceneSpec, target_density: np.ndarray) -> LossState:
    dtype = np.float64 if scene.simulator.dtype == "float64" else np.float32
    td = np.asarray(target_density, dtype=dtype).reshape(-1)
    sdf = precompute_target_sdf(
        np.asarray(target_density).reshape((scene.simulator.n_grid,) * 3),
        scene.simulator.dx,
    ).astype(dtype).reshape(-1)
    return LossState(target_density=jnp.asarray(td), target_sdf=jnp.asarray(sdf))


def _soft_weight(d):
    return 1.0 / (1.0 + d * d * 10000.0)  # reference loss.py:112-114


def contact_distances(scene: SceneSpec, state: SimState):
    """Per movable primitive: the (soft-)min clamped SDF over all particles
    (reference loss.py:116-140). Returns list of scalars."""
    out = []
    soft = scene.env.loss.soft_contact
    for i, p in enumerate(scene.primitives):
        if p.action_dim <= 0:
            continue  # only movable primitives (loss.py:21-24)
        d = prim.sdf(p, state.prim_pos[i], state.prim_rot[i], state.prim_gap[i],
                     state.x)
        d = jnp.maximum(d, 0.0)
        if soft:
            w = _soft_weight(d)
            out.append(jnp.sum(d * w) / jnp.sum(w))
        else:
            out.append(jnp.min(d))
    return out


def loss_and_components(scene: SceneSpec, loss_state: LossState,
                        state: SimState) -> Dict[str, jnp.ndarray]:
    """Total loss + components at the current state (reference
    compute_loss_kernel, loss.py:186-208)."""
    ls = scene.env.loss
    grid_m = compute_grid_m(scene, state.x)
    density_loss = jnp.sum(jnp.abs(grid_m - loss_state.target_density))
    sdf_loss = jnp.sum(loss_state.target_sdf * grid_m)
    dists = contact_distances(scene, state)
    contact_loss = (
        sum(d * d for d in dists) if dists else jnp.zeros((), dtype=state.x.dtype)
    )
    total = (
        ls.weight_contact * contact_loss
        + ls.weight_density * density_loss
        + ls.weight_sdf * sdf_loss
    )
    return {
        "loss": total,
        "contact_loss": contact_loss,
        "density_loss": density_loss,
        "sdf_loss": sdf_loss,
        "grid_m": grid_m,
    }


def loss_from_crop(scene: SceneSpec, loss_state: LossState, gm_crop, off,
                   state: SimState) -> Dict[str, jnp.ndarray]:
    """loss_and_components from a D^3 crop grid-mass at cell offset `off`
    (grid_m is identically zero outside the crop, so the global L1 density
    term decomposes exactly into crop |gm - td| plus the off-crop target
    mass). Pairs with mpm.env_step_with_grid_m; same quantities as
    loss_and_components (reference compute_loss_kernel, loss.py:186-208)."""
    import jax

    ls = scene.env.loss
    G = scene.simulator.n_grid
    D = round(gm_crop.shape[0] ** (1 / 3))
    td3 = loss_state.target_density.reshape(G, G, G)
    sdf3 = loss_state.target_sdf.reshape(G, G, G)
    td_crop = jax.lax.dynamic_slice(
        td3, (off[0], off[1], off[2]), (D, D, D)).reshape(-1)
    sdf_crop = jax.lax.dynamic_slice(
        sdf3, (off[0], off[1], off[2]), (D, D, D)).reshape(-1)
    gm = gm_crop.astype(td_crop.dtype)

    td_total = jnp.sum(loss_state.target_density)
    density_loss = (jnp.sum(jnp.abs(gm - td_crop))
                    + (td_total - jnp.sum(td_crop)))
    sdf_loss = jnp.sum(sdf_crop * gm)
    dists = contact_distances(scene, state)
    contact_loss = (
        sum(d * d for d in dists) if dists else jnp.zeros((), dtype=state.x.dtype)
    )
    total = (
        ls.weight_contact * contact_loss
        + ls.weight_density * density_loss
        + ls.weight_sdf * sdf_loss
    )
    # IoU from the crop: grid_m's max/sums are crop-local (zero outside);
    # the target's are global.
    ma = jnp.max(gm)
    mb = jnp.max(loss_state.target_density)
    I = jnp.sum(gm * td_crop) / ma / mb
    Ua = jnp.sum(gm) / ma
    Ub = td_total / mb
    return {
        "loss": total,
        "contact_loss": contact_loss,
        "density_loss": density_loss,
        "sdf_loss": sdf_loss,
        "iou": I / (Ua + Ub - I),
    }


def iou(grid_m, target_density):
    """Soft IoU (reference iou_kernel, loss.py:239-254)."""
    ma = jnp.max(grid_m)
    mb = jnp.max(target_density)
    I = jnp.sum(grid_m * target_density) / ma / mb
    Ua = jnp.sum(grid_m) / ma
    Ub = jnp.sum(target_density) / mb
    return I / (Ua + Ub - I)
