"""Differentiable-physics trajectory optimization over action sequences.

Behavioral reference: plb/optimizer/solver.py. Each iteration evaluates the
whole 50-step rollout loss and its gradient w.r.t. the (horizon, action_dim)
action matrix in ONE jitted value_and_grad call on device (the reference
re-simulates under ti.Tape and reads action_buffer.grad back per iteration,
solver.py:31-44); the Adam/Momentum update matches optim.py exactly and runs
on host over a tiny matrix.
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Callable, Optional, Sequence

import numpy as np

from ..engine.sim import PhysicsEnv
from .optim import OPTIMS, OptimizerConfig


@dataclass
class SolverConfig:
    optim: OptimizerConfig = field(default_factory=OptimizerConfig)
    n_iters: int = 100
    softness: float = 666.0
    horizon: int = 50
    init_range: float = 0.0
    init_sampler: str = "uniform"


class Solver:
    def __init__(self, env: PhysicsEnv, logger=None, cfg: Optional[SolverConfig] = None,
                 **kwargs):
        base = cfg or SolverConfig()
        optim_overrides = {
            k[len("optim."):]: v for k, v in kwargs.items() if k.startswith("optim.")
        }
        plain = {k: v for k, v in kwargs.items() if "." not in k}
        if optim_overrides:
            base = SolverConfig(
                **{**base.__dict__, "optim": OptimizerConfig(
                    **{**base.optim.__dict__, **optim_overrides})},
            )
        if plain:
            d = {**base.__dict__, **plain}
            base = SolverConfig(**d)
        self.cfg = base
        self.optim_cfg = self.cfg.optim
        self.env = env
        self.logger = logger

    def solve(self, init_actions=None, callbacks: Sequence[Callable] = (),
              checkpoint_dir: Optional[str] = None, checkpoint_every: int = 10):
        """Optimize the action sequence. With checkpoint_dir set, solver state
        (iteration, actions, Adam moments, best-so-far) is saved every
        checkpoint_every iterations and training resumes from the latest
        checkpoint automatically — a capability the reference lacks."""
        from ..utils import checkpoint as ckpt

        env = self.env
        if init_actions is None:
            init_actions = self.init_actions(env, self.cfg)
        optim = OPTIMS[self.optim_cfg.type](init_actions, self.optim_cfg)

        start_iter = 0
        best_action, best_loss = None, 1e10
        if checkpoint_dir:
            path = ckpt.latest(checkpoint_dir)
            if path:
                st = ckpt.load(path)
                start_iter = st["iter"]
                optim.parameters[:] = st["parameters"]
                for k, v in st["optim_state"].items():
                    setattr(optim, k, v)
                best_action, best_loss = st["best_action"], st["best_loss"]
                print(f"[solver] resumed from {path} at iter {start_iter}")

        env_state = env.get_state()
        self.total_steps = 0

        def forward(sim_state, actions):
            if self.logger is not None:
                self.logger.reset()
            env.set_state(sim_state, self.cfg.softness, False)
            loss, grad, _final = env.rollout_value_and_grad(
                env.state, actions, self.cfg.softness
            )
            self.total_steps += len(actions)
            if self.logger is not None:
                info = env.compute_loss()
                self.logger.step(None, None, info["reward"], None, True, info)
            return float(loss), np.asarray(grad, np.float64)

        from ..utils import Timer

        actions = optim.parameters.copy()
        for it in range(start_iter, self.cfg.n_iters):
            self.params = actions.copy()
            with Timer(f"[solver] iter {it}", print_on_exit=False) as t:
                loss, grad = forward(env_state["state"], actions)
            self.last_iter_seconds = t.elapsed
            if loss < best_loss:
                best_loss, best_action = loss, actions.copy()
            actions = optim.step(grad)
            for callback in callbacks:
                callback(self, optim, loss, grad)
            if checkpoint_dir and (it + 1) % checkpoint_every == 0:
                ostate = {
                    k: getattr(optim, k)
                    for k in ("momentum_buffer", "v_buffer", "iter", "momentum")
                    if hasattr(optim, k)
                }
                ckpt.save(
                    os.path.join(checkpoint_dir, f"ckpt_{it + 1}.pkl"),
                    {"iter": it + 1, "parameters": optim.parameters.copy(),
                     "optim_state": ostate, "best_action": best_action,
                     "best_loss": best_loss},
                )

        env.set_state(**env_state)
        self.best_loss = best_loss
        return best_action

    @staticmethod
    def init_actions(env: PhysicsEnv, cfg: SolverConfig):
        action_dim = env.scene.action_dim
        if cfg.init_sampler == "uniform":
            return np.random.uniform(
                -cfg.init_range, cfg.init_range, size=(cfg.horizon, action_dim)
            )
        raise NotImplementedError(cfg.init_sampler)


def solve_action(env, path, logger, args):
    """CLI entry (reference solver.py:86-101): optimize, then replay the best
    actions and dump one PNG per step."""
    os.makedirs(path, exist_ok=True)
    env.reset()
    taichi_env: PhysicsEnv = env.unwrapped.taichi_env
    T = env._max_episode_steps
    solver = Solver(
        taichi_env, logger, None,
        n_iters=(args.num_steps + T - 1) // T, softness=args.softness, horizon=T,
        **{"optim.lr": args.lr, "optim.type": args.optim, "init_range": 0.0001},
    )
    action = solver.solve()

    try:
        import cv2
    except ImportError:
        cv2 = None
    for idx, act in enumerate(action):
        env.step(act)
        img = env.render(mode="rgb_array")
        if cv2 is not None:
            cv2.imwrite(f"{path}/{idx:04d}.png", img[..., ::-1])
        else:
            np.save(f"{path}/{idx:04d}.npy", img)
    return action
