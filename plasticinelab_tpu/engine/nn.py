"""In-graph MLP policy: observations -> actions inside the differentiable
rollout.

Behavioral reference: plb/engine/nn/mlp.py (per-layer Taichi kernels become a
plain jnp MLP; the observation layout — obs_num sampled particle (x, v) pairs
+ primitive pose vectors, mlp.py:63-87 — and the [-1, 1] output clamp,
mlp.py:89-100, are preserved; flat get/set of parameters matches
mlp.py:154-183, with the optional trailing velocity_weight scalar).
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config.spec import SceneSpec
from .state import SimState, flat_primitive_states


class MLPPolicy:
    def __init__(self, scene: SceneSpec, hidden_dims: Tuple[int, ...] = (256, 256),
                 activation: str = "relu", n_observed_particles: int = 200):
        for p in scene.primitives:
            assert p.shape != "Chopsticks", "Chopstick is not supported now.."
        self.scene = scene
        n = scene.simulator.n_particles
        self.obs_step = n // n_observed_particles
        self.obs_num = n // self.obs_step
        inp_dim = self.obs_num * 6 + scene.primitive_state_dim
        self.dims = (inp_dim,) + tuple(hidden_dims) + (scene.action_dim,)
        self.n_layer = len(self.dims) - 1
        self.activation = activation
        self.velocity_weight = 1.0

    # ---- parameters ----
    def init_params(self, seed: int = 0, dtype=jnp.float32) -> Dict:
        rng = np.random.default_rng(seed)
        params = {}
        for i in range(self.n_layer):
            fan_in, fan_out = self.dims[i], self.dims[i + 1]
            bound = 1.0 / np.sqrt(fan_in)
            params[f"W{i}"] = jnp.asarray(
                rng.uniform(-bound, bound, (fan_out, fan_in)), dtype)
            params[f"b{i}"] = jnp.asarray(
                rng.uniform(-bound, bound, (fan_out,)), dtype)
        return params

    def get_params(self, params: Dict) -> np.ndarray:
        outs = []
        for i in range(self.n_layer):
            outs += [np.asarray(params[f"W{i}"], np.float64).reshape(-1),
                     np.asarray(params[f"b{i}"], np.float64).reshape(-1)]
        return np.concatenate(outs)

    def set_params(self, flat: np.ndarray, dtype=jnp.float32) -> Dict:
        params = {}
        flat = np.asarray(flat)
        for i in range(self.n_layer):
            shape = (self.dims[i + 1], self.dims[i])
            n = shape[0] * shape[1]
            params[f"W{i}"] = jnp.asarray(flat[:n].reshape(shape), dtype)
            flat = flat[n:]
            n = self.dims[i + 1]
            params[f"b{i}"] = jnp.asarray(flat[:n], dtype)
            flat = flat[n:]
        if len(flat) == 1:
            self.velocity_weight = float(flat[0])
        else:
            self.velocity_weight = 1.0
            assert len(flat) == 0
        return params

    # ---- forward ----
    def observe(self, state: SimState) -> jnp.ndarray:
        """mlp.py:63-87 input layout: obs_num x (x, v*vel_weight) then
        primitive poses."""
        x = state.x[:: self.obs_step][: self.obs_num]
        v = state.v[:: self.obs_step][: self.obs_num] * self.velocity_weight
        prim = flat_primitive_states(self.scene, state)
        return jnp.concatenate(
            [jnp.concatenate([x, v], axis=-1).reshape(-1), prim]
        )

    def apply(self, params: Dict, obs: jnp.ndarray) -> jnp.ndarray:
        h = obs
        for i in range(self.n_layer):
            h = params[f"W{i}"] @ h + params[f"b{i}"]
            if i != self.n_layer - 1:
                if self.activation == "relu":
                    h = jnp.maximum(h, 0.0)
                elif self.activation == "tanh":
                    h = jnp.tanh(h)
        return jnp.clip(h, -1.0, 1.0)

    def act(self, params: Dict, state: SimState) -> jnp.ndarray:
        return self.apply(params, self.observe(state))
