"""RL algorithm unit tests: update steps move parameters and stay finite."""
import numpy as np
import jax
import jax.numpy as jnp

from plasticinelab_tpu.algorithms.common import ReplayBuffer


def _fill_buffer(state_dim, act_dim, n=300, seed=0):
    rng = np.random.default_rng(seed)
    buf = ReplayBuffer(state_dim, act_dim, max_size=1000)
    for _ in range(n):
        buf.add(
            rng.standard_normal(state_dim), rng.uniform(-1, 1, act_dim),
            rng.standard_normal(state_dim), rng.standard_normal(), 0.0,
        )
    return buf


def test_replay_buffer_ring():
    buf = ReplayBuffer(3, 2, max_size=10)
    for i in range(25):
        buf.add(np.full(3, i), np.zeros(2), np.zeros(3), float(i), 0.0)
    assert buf.size == 10
    s, a, ns, r, nd = buf.sample(32, np.random.default_rng(0))
    assert s.shape == (32, 3) and r.min() >= 15  # only the last 10 remain


def test_td3_update():
    from plasticinelab_tpu.algorithms.td3.td3 import TD3

    policy = TD3(state_dim=8, action_dim=3)
    buf = _fill_buffer(8, 3)
    p0 = jax.tree.leaves(policy.state.critic)[0].copy()
    rng = np.random.default_rng(1)
    for _ in range(3):
        loss = policy.train(buf, batch_size=32, rng=rng)
    assert np.isfinite(loss)
    assert not np.allclose(p0, jax.tree.leaves(policy.state.critic)[0])
    a = policy.select_action(np.zeros(8, np.float32))
    assert a.shape == (3,) and np.all(np.abs(a) <= 1.0)


def test_td3_train_many():
    from plasticinelab_tpu.algorithms.td3.td3 import TD3

    policy = TD3(state_dim=8, action_dim=3)
    buf = _fill_buffer(8, 3)
    c0 = jax.tree.leaves(policy.state.critic)[0].copy()
    loss = policy.train_many(buf, batch_size=32,
                             rng=np.random.default_rng(1), n=3)
    assert np.isfinite(loss)
    assert int(policy.state.step) == 3  # scanned 3 update steps
    assert not np.allclose(c0, jax.tree.leaves(policy.state.critic)[0])
    a = policy.select_action_batch(np.zeros((4, 8), np.float32))
    assert a.shape == (4, 3) and np.all(np.abs(a) <= 1.0)


def test_ddpg_update():
    from plasticinelab_tpu.algorithms.td3.ddpg import DDPG

    policy = DDPG(state_dim=8, action_dim=3)
    buf = _fill_buffer(8, 3)
    loss = policy.train(buf, batch_size=32, rng=np.random.default_rng(1))
    assert np.isfinite(loss)


def test_original_ddpg_update_and_weight_decay():
    """Reference TD3/DDPG.py variant: critic L2 decay shrinks weights the
    plain-Adam critic would not touch on zero gradients."""
    import jax
    import jax.numpy as jnp

    from plasticinelab_tpu.algorithms.td3.ddpg import DDPG, OriginalDDPG

    policy = OriginalDDPG(state_dim=8, action_dim=3)
    buf = _fill_buffer(8, 3)
    loss = policy.train(buf, batch_size=32, rng=np.random.default_rng(1))
    assert np.isfinite(loss)
    a = policy.select_action(np.zeros(8, np.float32))
    assert a.shape == (3,) and np.all(np.abs(a) <= 1.0)
    # the two variants share nets but differ in optimizers/tau
    assert policy.tau == 0.001 and DDPG(8, 3).tau == 0.005


def test_sac_update_and_entropy_tuning():
    from plasticinelab_tpu.algorithms.sac.sac import SAC

    algo = SAC(state_dim=8, action_dim=3)
    buf = _fill_buffer(8, 3)
    la0 = float(algo.state.log_alpha)
    rng = np.random.default_rng(2)
    for _ in range(3):
        loss = algo.update(buf, batch_size=32, rng=rng)
    assert np.isfinite(loss)
    assert float(algo.state.log_alpha) != la0  # alpha is being tuned
    a = algo.explore(np.zeros(8, np.float32))
    assert a.shape == (3,) and np.all(np.abs(a) <= 1.0)
    d = algo.exploit(np.zeros(8, np.float32))
    assert np.all(np.abs(d) <= 1.0)


def test_sac_alpha_gradient_is_bounded():
    """The entropy-temperature loss must be LINEAR in log_alpha (reference
    discor/algorithm/sac.py:134-136): its gradient is then bounded by
    |logp + target_entropy| regardless of alpha's current value. The exp
    form has gradient ∝ alpha, which compounds into exponential runaway
    (observed on-chip: alpha 0.2 → 3e5 over 50k env steps, policy collapse
    — round-4 probe diagnosis). Pin the gradient's alpha-independence."""
    import jax
    import jax.numpy as jnp

    from plasticinelab_tpu.algorithms.sac.sac import SAC

    algo = SAC(state_dim=8, action_dim=3)
    logp = jnp.asarray([-1.0, -2.0, 0.5])

    def alpha_loss(la):
        return -jnp.mean(la * jax.lax.stop_gradient(logp + algo.target_entropy))

    g_small = jax.grad(alpha_loss)(jnp.asarray(0.0))    # alpha = 1
    g_large = jax.grad(alpha_loss)(jnp.asarray(10.0))   # alpha = 22026
    assert np.allclose(np.asarray(g_small), np.asarray(g_large))
    # and the update path clamps a runaway temperature back to the cap
    buf = _fill_buffer(8, 3)
    big = algo.state._replace(log_alpha=jnp.asarray(10.0))
    algo.state = big
    algo.update(buf, batch_size=32, rng=np.random.default_rng(5))
    assert float(algo.state.log_alpha) <= algo.log_alpha_max + 1e-6


def test_sac_update_many_matches_semantics():
    """update_many(n) = n scanned update steps in one dispatch: state
    advances, loss finite, and explore still bounded."""
    from plasticinelab_tpu.algorithms.sac.sac import SAC

    algo = SAC(state_dim=8, action_dim=3)
    buf = _fill_buffer(8, 3)
    rng = np.random.default_rng(3)
    la0 = float(algo.state.log_alpha)
    loss = algo.update_many(buf, batch_size=32, rng=rng, n=3)
    assert np.isfinite(loss)
    assert float(algo.state.log_alpha) != la0
    a = algo.explore_batch(np.zeros((4, 8), np.float32))
    assert a.shape == (4, 3) and np.all(np.abs(a) <= 1.0)


def test_discor_update():
    from plasticinelab_tpu.algorithms.sac.discor import DisCor

    algo = DisCor(state_dim=8, action_dim=3)
    buf = _fill_buffer(8, 3)
    loss = algo.update(buf, batch_size=32, rng=np.random.default_rng(3))
    assert np.isfinite(loss)
    assert np.isfinite(float(algo.dstate.tau1))


def test_discor_update_many_device():
    """DisCor's device-resident scanned update threads the error-model state
    (so --algo discor --vec_envs B keeps the in-graph sampling path), and
    the CLI exposes discor as a first-class algo."""
    import jax

    from plasticinelab_tpu.algorithms.common import DeviceReplayBuffer
    from plasticinelab_tpu.algorithms.sac.discor import DisCor
    from plasticinelab_tpu.algorithms.solve import RL_ALGOS, get_args

    assert "discor" in RL_ALGOS
    assert get_args(["--algo", "discor"]).algo == "discor"

    algo = DisCor(state_dim=8, action_dim=3, seed=0)
    buf = DeviceReplayBuffer(8, 3, max_size=64)
    rng = np.random.default_rng(7)
    for _ in range(4):
        s = rng.random((16, 8)).astype(np.float32)
        buf.add_batch(s, rng.uniform(-1, 1, (16, 3)), s + 0.1,
                      rng.random(16), np.zeros(16))
    tau0 = float(algo.dstate.tau1)
    before = algo.state.policy
    loss = algo.update_many_device(buf, batch_size=32, n=3)
    assert np.isfinite(float(loss))
    assert float(algo.dstate.tau1) != tau0  # error model advanced too
    changed = jax.tree.reduce(
        lambda a, b: a or b,
        jax.tree.map(lambda a, b: bool(np.any(a != b)), before,
                     algo.state.policy))
    assert changed


def test_ppo_update():
    from plasticinelab_tpu.algorithms.ppo.ppo import PPO

    agent = PPO(state_dim=8, action_dim=3, num_mini_batch=4)
    rng = np.random.default_rng(4)
    n = 64
    rollouts = {
        "obs": rng.standard_normal((n, 8)).astype(np.float32),
        "actions": rng.uniform(-1, 1, (n, 3)).astype(np.float32),
        "logp": rng.standard_normal(n).astype(np.float32),
        "returns": rng.standard_normal(n).astype(np.float32),
        "values": rng.standard_normal(n).astype(np.float32),
    }
    loss = agent.update(rollouts, rng)
    assert np.isfinite(loss)
    a, logp, v = agent.act(np.zeros(8, np.float32))
    assert a.shape == (3,) and np.isfinite(logp) and np.isfinite(v)


def test_mlp_policy_roundtrip():
    from plasticinelab_tpu.config.spec import (
        PrimitiveSpec, SceneSpec, SimulatorSpec,
    )
    from plasticinelab_tpu.engine.nn import MLPPolicy
    from plasticinelab_tpu.engine.state import initial_state

    scene = SceneSpec(
        simulator=SimulatorSpec(quality=0.25, n_particles=400, dtype="float64"),
        primitives=(PrimitiveSpec(shape="Sphere", radius=0.05,
                                  action_dim=3, action_scale=(0.01,) * 3),),
    )
    policy = MLPPolicy(scene, hidden_dims=(32, 32))
    params = policy.init_params(dtype=jnp.float64)
    flat = policy.get_params(params)
    params2 = policy.set_params(flat, dtype=jnp.float64)
    # round-trip exactness (reference solver_nn.py:110-111 asserts < 1e-9)
    assert np.abs(policy.get_params(params2) - flat).max() < 1e-12

    rng = np.random.default_rng(0)
    state = initial_state(scene, rng.random((400, 3)) * 0.2 + 0.4)
    action = policy.act(params, state)
    assert action.shape == (scene.action_dim,)
    assert np.all(np.abs(np.asarray(action)) <= 1.0)


def test_gail_discriminator():
    from plasticinelab_tpu.algorithms.ppo.gail import GAIL

    rng = np.random.default_rng(5)
    gail = GAIL(obs_dim=8, act_dim=3)
    expert = (rng.standard_normal((32, 8)).astype(np.float32) + 1.0,
              rng.uniform(-1, 1, (32, 3)).astype(np.float32))
    agent = (rng.standard_normal((32, 8)).astype(np.float32) - 1.0,
             rng.uniform(-1, 1, (32, 3)).astype(np.float32))
    losses = [gail.update(expert, agent) for _ in range(20)]
    assert np.isfinite(losses).all()
    # after training, expert transitions should look more expert-like
    r_e = gail.predict_reward(*expert).mean()
    r_a = gail.predict_reward(*agent).mean()
    assert r_e > r_a, (r_e, r_a)


def test_a2c_update():
    from plasticinelab_tpu.algorithms.ppo.a2c import A2C

    agent = A2C(state_dim=8, action_dim=3)
    rng = np.random.default_rng(6)
    n = 64
    rollouts = {
        "obs": rng.standard_normal((n, 8)).astype(np.float32),
        "actions": rng.uniform(-1, 1, (n, 3)).astype(np.float32),
        "returns": rng.standard_normal(n).astype(np.float32),
    }
    loss = agent.update(rollouts)
    assert np.isfinite(loss)
    a, logp, v = agent.act(np.zeros(8, np.float32))
    assert a.shape == (3,) and np.isfinite(logp) and np.isfinite(v)


def test_acktr_update_step():
    """KFAC/ACKTR (reference kfac.py + a2c_acktr.py acktr=True): two update
    steps on a fake rollout decrease nothing in particular but must produce
    finite losses, changed params, and a KL-clipped natural-gradient step."""
    import numpy as np
    import jax.numpy as jnp
    from plasticinelab_tpu.algorithms.ppo.kfac import A2C_ACKTR

    rng = np.random.default_rng(0)
    state_dim, action_dim, B = 12, 4, 32
    agent = A2C_ACKTR(state_dim, action_dim, seed=0)
    p0 = jax.tree.map(lambda a: np.asarray(a).copy(), agent.params)

    a, logp, v = agent.act(rng.standard_normal(state_dim))
    assert a.shape == (action_dim,) and np.isfinite(logp) and np.isfinite(v)

    rollouts = {
        "obs": jnp.asarray(rng.standard_normal((B, state_dim)), jnp.float32),
        "actions": jnp.asarray(rng.standard_normal((B, action_dim)), jnp.float32),
        "returns": jnp.asarray(rng.standard_normal(B), jnp.float32),
    }
    losses = [agent.update(rollouts) for _ in range(3)]
    assert all(np.isfinite(l) for l in losses), losses
    assert int(agent.kstate.step) == 3

    changed = jax.tree.map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - b))), agent.params, p0)
    total = sum(jax.tree.leaves(changed))
    assert total > 1e-6, "params did not move"
    for leaf in jax.tree.leaves(agent.params):
        assert np.all(np.isfinite(np.asarray(leaf)))
