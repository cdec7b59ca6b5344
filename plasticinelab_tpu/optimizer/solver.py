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

    # ------------------------------------------------------------------
    # fully device-resident solve loop (no reference counterpart; the
    # reference reads grads back to host and steps numpy Adam every
    # iteration, plb/optimizer/solver.py:31-44 + optim.py:49-78)
    # ------------------------------------------------------------------
    def solve_device(self, init_actions=None, chunk: int = 10,
                     checkpoint_dir: Optional[str] = None):
        """Run the whole optimization on device: value_and_grad + Adam (or
        Momentum) + bounds clip + best-so-far tracking inside one jitted
        lax.scan over `chunk` iterations per dispatch. The host only fetches
        per-iteration losses between chunks (for logging/checkpointing), so
        steady-state cost is the device gradient alone — the ~0.3 s/iter
        host Adam + transfer gap of the host loop disappears.

        Update rule matches optim.py bit-for-bit in f32 (the host path runs
        f64; the action matrix is (horizon, action_dim) and the solve is
        gradient-noise-dominated, so the f32 moments are immaterial — see
        tests/test_solver.py::test_device_solver_matches_host).
        """
        import jax
        import jax.numpy as jnp

        from ..engine import mpm
        from ..engine import losses as losses_mod
        from ..utils import checkpoint as ckpt

        env = self.env
        cfg, ocfg = self.cfg, self.optim_cfg
        assert ocfg.type in ("Adam", "Momentum"), ocfg.type
        if init_actions is None:
            init_actions = self.init_actions(env, cfg)

        scene, mats = env.scene, env.mats
        dtype = env.dtype
        loss_state = env.loss_state
        softness = dtype(cfg.softness)
        env_state = env.get_state()
        state0 = env.state  # SimState PyTree at the solve's start

        def rollout_loss(actions):
            rscene = mpm.resolve_remat(scene, int(actions.shape[0]))

            def step_fn(carry, action):
                st, gm, off = mpm.env_step_with_grid_m(
                    rscene, mats, carry, action, softness)
                info = losses_mod.loss_from_crop(
                    rscene, loss_state, gm, off, st)
                comps = jnp.stack([info["loss"], info["sdf_loss"],
                                   info["density_loss"], info["contact_loss"],
                                   jax.lax.stop_gradient(info["iou"])])
                return st, comps

            if rscene.simulator.remat in ("env_step", "both"):
                step_fn = jax.checkpoint(step_fn)
            _, comps = jax.lax.scan(step_fn, state0, actions)
            # components sum over the horizon; iou is the FINAL step's
            # (the benchmark metric is end-of-episode, loss.py:293)
            out = jnp.concatenate([jnp.sum(comps[:, :4], axis=0),
                                   comps[-1:, 4]])
            return out[0], out

        lr = dtype(ocfg.lr)
        b1, b2, eps = dtype(ocfg.beta_1), dtype(ocfg.beta_2), dtype(ocfg.epsilon)
        mom = dtype(ocfg.momentum)
        lo, hi = ocfg.bounds

        def iter_fn(carry, _):
            actions, m, v, it, best_loss, best_actions, lr_scale = carry
            (loss, comps), grad = jax.value_and_grad(
                rollout_loss, has_aux=True)(actions)
            better = loss < best_loss  # False for NaN loss: best is protected
            best_loss = jnp.where(better, loss, best_loss)
            best_actions = jnp.where(better, actions, best_actions)
            # f32 divergence recovery (the reference runs f64 and has no
            # guard): a non-finite rollout must not poison the moments —
            # restart from the best actions seen with fresh moments and a
            # halved step, instead of turning every later iterate into NaN
            finite = jnp.isfinite(loss) & jnp.all(jnp.isfinite(grad))
            grad = jnp.where(finite, grad, 0.0)
            if ocfg.type == "Adam":
                m = b1 * m + (1 - b1) * grad
                v = b2 * v + (1 - b2) * grad * grad
                m_cap = m / (1 - b1 ** (it + 1))
                v_cap = v / (1 - b2 ** (it + 1))
                upd = lr * lr_scale * m_cap / (jnp.sqrt(v_cap) + eps)
            else:  # Momentum (optim.py:33-46)
                m = m * mom + grad * (1 - mom)
                upd = lr * lr_scale * m
            actions = jnp.where(
                finite, jnp.clip(actions - upd, lo, hi), best_actions)
            m = jnp.where(finite, m, 0.0)
            v = jnp.where(finite, v, 0.0)
            lr_scale = jnp.where(finite, lr_scale, lr_scale * 0.5)
            return (actions, m, v, it + 1, best_loss, best_actions,
                    lr_scale), comps

        @jax.jit
        def run_chunk(carry):
            return jax.lax.scan(iter_fn, carry, None, length=chunk)

        actions = jnp.asarray(init_actions, dtype)
        m = jnp.zeros_like(actions)
        v = jnp.zeros_like(actions)
        it0 = jnp.zeros((), dtype)
        best_loss = jnp.asarray(1e10, dtype)
        best_actions = actions

        start_iter = 0
        if checkpoint_dir:
            path = ckpt.latest(checkpoint_dir)
            if path:
                st = ckpt.load(path)
                start_iter = st["iter"]
                actions = jnp.asarray(st["parameters"], dtype)
                m = jnp.asarray(st["optim_state"]["momentum_buffer"], dtype)
                v = jnp.asarray(st["optim_state"]["v_buffer"], dtype)
                it0 = jnp.asarray(float(start_iter), dtype)
                best_loss = jnp.asarray(st["best_loss"], dtype)
                best_actions = jnp.asarray(st["best_action"], dtype)
                print(f"[solver] resumed from {path} at iter {start_iter}")

        carry = (actions, m, v, it0, best_loss, best_actions,
                 jnp.asarray(1.0, dtype))
        self.iter_losses = []
        self.iter_ious = []  # final-step raw IoU per iteration
        self.chunk_seconds = []
        n_chunks = (cfg.n_iters - start_iter + chunk - 1) // chunk
        done = start_iter
        import time as _time
        for c in range(n_chunks):
            n = min(chunk, cfg.n_iters - done)
            if n < chunk:  # tail chunk: recompile once at the smaller length
                @jax.jit
                def run_chunk(carry, n=n):
                    return jax.lax.scan(iter_fn, carry, None, length=n)
            t0 = _time.perf_counter()
            carry, comps = run_chunk(carry)
            jax.block_until_ready(comps)
            self.chunk_seconds.append(_time.perf_counter() - t0)
            comps = np.asarray(comps, np.float64)  # (n, 5)
            self.iter_losses.extend(comps[:, 0].tolist())
            self.iter_ious.extend(comps[:, 4].tolist())
            done += n
            if self.logger is not None:
                # one logger episode per iteration, like the host loop
                init_iou, target_iou = env._init_iou, env._target_iou
                for L, S, D, C, I in comps:
                    inc = max(min((I - init_iou)
                                  / (target_iou - init_iou), 1.0), 0.0)
                    self.logger.reset()
                    self.logger.step(None, None, -L, None, True, {
                        "loss": L, "sdf_loss": S, "density_loss": D,
                        "contact_loss": C, "incremental_iou": inc})
            if checkpoint_dir:
                ckpt.save(
                    os.path.join(checkpoint_dir, f"ckpt_{done}.pkl"),
                    {"iter": done,
                     "parameters": np.asarray(carry[0], np.float64),
                     "optim_state": {
                         "momentum_buffer": np.asarray(carry[1], np.float64),
                         "v_buffer": np.asarray(carry[2], np.float64),
                         "iter": done, "momentum": float(mom)},
                     "best_action": np.asarray(carry[5], np.float64),
                     "best_loss": float(carry[4])},
                )

        env.set_state(**env_state)
        self.best_loss = float(carry[4])
        self.total_steps = (cfg.n_iters - start_iter) * cfg.horizon
        return np.asarray(carry[5], np.float64)

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
    if getattr(args, "host_loop", False):
        action = solver.solve()
    else:
        action = solver.solve_device()

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
