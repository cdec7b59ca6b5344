"""Task registry: 10 tasks x 5 variants (reference plb/envs/__init__.py).

make() returns a TimeLimit-wrapped PlasticineEnv with loss weights applied at
build time (they specialize the jitted loss, so they must precede
compilation — the reference mutates Taichi fields instead, envs/__init__.py:
16-20).
"""
from __future__ import annotations

import dataclasses
import os
import re

from .env import PlasticineEnv

ENV_NAMES = [
    "Move", "Torus", "Rope", "Writer", "Pinch", "Rollingpin", "Chopsticks",
    "Table", "TripleMove", "Assembly",
]

ENVS = [f"{name}-v{v}" for name in ENV_NAMES for v in range(1, 6)]


def _parse(env_name: str):
    m = re.fullmatch(r"([A-Za-z]+)-v(\d+)", env_name)
    if not m or m.group(1) not in ENV_NAMES:
        raise ValueError(f"unknown env {env_name!r}; registered: {ENVS}")
    return m.group(1).lower(), int(m.group(2))


def make(env_name: str, nn: bool = False, sdf_loss: float = 10,
         density_loss: float = 10, contact_loss: float = 1,
         soft_contact_loss: bool = False, max_episode_steps: int = 50,
         obs_mode: str = "state", image_obs_res: int = 64,
         image_obs_spp: int = 2):
    try:
        from gymnasium.wrappers import TimeLimit as _TimeLimit
    except ImportError:  # pragma: no cover
        from gym.wrappers import TimeLimit as _TimeLimit

    class TimeLimit(_TimeLimit):
        """Forwards render(mode=...) like the classic gym API — the reference
        code calls env.render(mode='rgb_array') through wrappers
        (plb/optimizer/solver.py:99)."""

        def render(self, *args, **kwargs):
            return self.env.render(*args, **kwargs)

        def seed(self, seed=None):
            return self.env.seed(seed)

    task, version = _parse(env_name)
    scene = PlasticineEnv._load_scene(f"{task}.yml", version)
    loss = dataclasses.replace(
        scene.env.loss,
        weight_sdf=sdf_loss, weight_density=density_loss,
        weight_contact=contact_loss, soft_contact=soft_contact_loss,
    )
    scene = scene.replace(env=dataclasses.replace(scene.env, loss=loss))
    env = PlasticineEnv(f"{task}.yml", version, nn=nn, scene=scene,
                        obs_mode=obs_mode, image_obs_res=image_obs_res,
                        image_obs_spp=image_obs_spp)
    wrapped = TimeLimit(env, max_episode_steps=max_episode_steps)
    wrapped._max_episode_steps = max_episode_steps
    return wrapped


def register_gymnasium():
    """Optionally register all tasks with gymnasium's global registry."""
    import gymnasium

    for name in ENV_NAMES:
        for v in range(1, 6):
            gymnasium.register(
                id=f"{name}-v{v}",
                entry_point="plasticinelab_tpu.envs.env:PlasticineEnv",
                kwargs={"cfg_path": f"{name.lower()}.yml", "version": v},
                max_episode_steps=50,
            )
