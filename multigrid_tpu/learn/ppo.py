"""PPO with env + learner co-located on one device mesh.

One jitted ``train_step``: rollout ``T`` lockstep steps across the sharded env
batch (scan of policy-forward + env-step, all on device), compute GAE, then a
clipped-PPO update. With envs sharded over the mesh's ``'env'`` axis and
parameters replicated, the only cross-chip traffic is the gradient
all-reduce XLA inserts at the update — collectives ride ICI and overlap with
the backward pass.

Functional equivalent of the reference's RLlib PPO example
(multigrid/scripts/train.py:126-199), minus the Ray process topology: where
the reference ships observations between env-runner workers and a torch
learner through Ray's object store, here "shipping" is a sharding constraint.
All agents share one policy by default (self-play); set
``PPOConfig(per_agent_policies=True)`` for the reference's independent
``policy_{i}`` scheme (scripts/train.py:154-158) — a stacked parameter
pytree with a leading agent axis, vmapped at apply time.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..parallel.vector import VectorEnv
from .nets import ActorCritic


@struct.dataclass
class PPOConfig:
    rollout_steps: int = struct.field(pytree_node=False, default=16)
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_eps: float = 0.2
    vf_coef: float = 0.5
    ent_coef: float = 0.01
    lr: float = 3e-4
    max_grad_norm: float = 0.5
    epochs: int = struct.field(pytree_node=False, default=1)
    #: SGD minibatches per epoch (RLlib PPO reuses the batch in shuffled
    #: minibatches; 1 = whole-batch updates). The (T·E) batch is flattened,
    #: permuted per epoch and split — note the permutation crosses the
    #: sharded env axis, so prefer 1 for multi-host meshes.
    minibatches: int = struct.field(pytree_node=False, default=1)
    #: Independent parameters per agent (the reference's policy_{i}).
    per_agent_policies: bool = struct.field(pytree_node=False, default=False)


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    env_state: Any
    last_obs: Any
    key: jax.Array
    update_count: jax.Array


@struct.dataclass
class Rollout:
    """(T, E, N, ...) trajectory slices."""
    image: jax.Array
    direction: jax.Array
    action: jax.Array
    log_prob: jax.Array
    value: jax.Array
    reward: jax.Array
    done: jax.Array
    #: Mission indices for mission-parameterized envs (None otherwise).
    mission: jax.Array | None = None


def clip_by_global_norm_per_agent(max_norm: float):
    """Like ``optax.clip_by_global_norm`` but with an independent norm per
    leading-axis (agent) parameter slice, so one agent's gradient spike does
    not rescale every other agent's update."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        sq = sum(
            jnp.sum(jnp.square(g), axis=tuple(range(1, g.ndim)))
            for g in jax.tree.leaves(updates)
        )  # (N,)
        norm = jnp.sqrt(sq)
        scale = jnp.minimum(1.0, max_norm / (norm + 1e-16))

        def apply(g):
            s = scale.reshape(scale.shape + (1,) * (g.ndim - 1))
            return g * s

        return jax.tree.map(apply, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def ppo_init(
    venv: VectorEnv,
    key: jax.Array,
    *,
    net: ActorCritic | None = None,
    config: PPOConfig | None = None,
    per_agent_policies: bool | None = None,
):
    """Initialize (train_state, net, config, optimizer).

    ``PPOConfig(per_agent_policies=True)`` gives each agent its own
    parameters (the reference example trains an independent ``policy_{i}``
    per agent, multigrid/scripts/train.py:154-158) — a stacked parameter
    pytree with a leading agent axis, vmapped at apply time, clipped per
    agent slice. Default is shared-parameter self-play. (The keyword
    argument is a deprecated alias for the config field.)
    """
    config = config or PPOConfig()
    if per_agent_policies is not None:
        config = config.replace(per_agent_policies=per_agent_policies)
    k_env, k_net, k_train = jax.random.split(key, 3)
    obs, env_state = venv.reset(k_env)
    if net is None:
        # Mission-parameterized envs surface an index in the obs — size the
        # conditioning one-hot from the env's mission space automatically.
        num_missions = (
            len(venv.env.mission_space) if 'mission' in obs else 0)
        net = ActorCritic(num_missions=num_missions)
    mission0 = obs['mission'][0, 0] if 'mission' in obs else None
    if config.per_agent_policies:
        net_keys = jax.random.split(k_net, venv.num_agents)
        params = jax.vmap(
            lambda k: net.init(
                k, obs['image'][0, 0], obs['direction'][0, 0], mission0)
        )(net_keys)
        clip = clip_by_global_norm_per_agent(config.max_grad_norm)
    else:
        params = net.init(
            k_net, obs['image'][0, 0], obs['direction'][0, 0], mission0
        )
        clip = optax.clip_by_global_norm(config.max_grad_norm)
    tx = optax.chain(clip, optax.adam(config.lr))
    state = TrainState(
        params=params,
        opt_state=tx.init(params),
        env_state=env_state,
        last_obs=obs,
        key=k_train,
        update_count=jnp.zeros((), jnp.int32),
    )
    return state, net, config, tx


def make_train_step(
    venv: VectorEnv,
    net: ActorCritic,
    config: PPOConfig,
    tx: optax.GradientTransformation,
    per_agent_policies: bool | None = None,
) -> Callable[[TrainState], tuple[TrainState, dict]]:
    """Build the jitted PPO update: rollout + GAE + clipped surrogate step.

    With ``config.per_agent_policies`` the parameter pytree carries a leading
    agent axis (see :func:`ppo_init`) and each agent's observations route
    through its own parameters via ``vmap`` — the reference's independent
    ``policy_{i}`` scheme (multigrid/scripts/train.py:154-158). The keyword
    argument is a deprecated alias for the config field.
    """
    if per_agent_policies is not None:
        config = config.replace(per_agent_policies=per_agent_policies)

    if config.per_agent_policies:
        def apply_net(params, image, direction, mission=None):
            # image (..., N, vs, vs, 3), direction (..., N): agent axis to
            # front, one net application per agent's parameter slice.
            img = jnp.moveaxis(image, -4, 0)
            dirn = jnp.moveaxis(direction, -1, 0)
            mis = None if mission is None else jnp.moveaxis(mission, -1, 0)
            logits, value = jax.vmap(
                lambda p, i, d: net.apply(p, i, d)
            )(params, img, dirn) if mis is None else jax.vmap(
                net.apply)(params, img, dirn, mis)
            return jnp.moveaxis(logits, 0, -2), jnp.moveaxis(value, 0, -1)
    else:
        apply_net = net.apply

    def policy(params, obs):
        # obs arrays are (E, N, ...): flatten agents into the batch.
        logits, value = apply_net(
            params, obs['image'], obs['direction'], obs.get('mission'))
        return logits, value

    def rollout_phase(state: TrainState) -> tuple[TrainState, Rollout, jax.Array]:
        def body(carry, _):
            env_state, obs, key = carry
            key, k_act = jax.random.split(key)
            logits, value = policy(state.params, obs)
            action = jax.random.categorical(k_act, logits)
            log_prob = jnp.take_along_axis(
                jax.nn.log_softmax(logits), action[..., None], axis=-1
            ).squeeze(-1)
            next_obs, env_state, reward, term, trunc, done = venv.step(
                env_state, action.astype(jnp.int32)
            )
            step_data = Rollout(
                image=obs['image'], direction=obs['direction'],
                action=action, log_prob=log_prob, value=value,
                reward=reward, done=done[:, None] | term,
                mission=obs.get('mission'),
            )
            return (env_state, next_obs, key), step_data

        (env_state, last_obs, key), traj = jax.lax.scan(
            body, (state.env_state, state.last_obs, state.key),
            None, length=config.rollout_steps,
        )
        _, last_value = policy(state.params, last_obs)
        state = state.replace(env_state=env_state, last_obs=last_obs, key=key)
        return state, traj, last_value

    def compute_gae(traj: Rollout, last_value: jax.Array):
        def body(carry, step):
            gae, next_value = carry
            value, reward, done = step
            not_done = 1.0 - done.astype(jnp.float32)
            delta = reward + config.gamma * next_value * not_done - value
            gae = delta + config.gamma * config.gae_lambda * not_done * gae
            return (gae, value), gae

        (_, _), advantages = jax.lax.scan(
            body,
            (jnp.zeros_like(last_value), last_value),
            (traj.value, traj.reward, traj.done),
            reverse=True,
        )
        return advantages, advantages + traj.value

    def loss_fn(params, traj: Rollout, advantages, targets):
        logits, value = apply_net(
            params, traj.image, traj.direction, traj.mission)
        log_probs = jax.nn.log_softmax(logits)
        log_prob = jnp.take_along_axis(
            log_probs, traj.action[..., None], axis=-1
        ).squeeze(-1)
        ratio = jnp.exp(log_prob - traj.log_prob)
        if config.per_agent_policies:
            # Normalize within each agent's own batch — pooling the stats
            # across agents would couple the 'independent' policies through
            # each other's reward statistics. (Batch axes = all but the
            # trailing agent axis, so this works on both (T, E, N) rollouts
            # and flattened (B, N) minibatches.)
            axes = tuple(range(advantages.ndim - 1))
            mu = advantages.mean(axis=axes, keepdims=True)
            sd = advantages.std(axis=axes, keepdims=True)
        else:
            mu = advantages.mean()
            sd = advantages.std()
        adv = (advantages - mu) / (sd + 1e-8)
        pg_loss = -jnp.minimum(
            ratio * adv,
            jnp.clip(ratio, 1 - config.clip_eps, 1 + config.clip_eps) * adv,
        ).mean()
        vf_loss = 0.5 * jnp.square(value - targets).mean()
        entropy = -(jnp.exp(log_probs) * log_probs).sum(-1).mean()
        loss = pg_loss + config.vf_coef * vf_loss - config.ent_coef * entropy
        return loss, {
            'loss': loss, 'pg_loss': pg_loss, 'vf_loss': vf_loss,
            'entropy': entropy,
        }

    def sgd_step(params, opt_state, traj, advantages, targets):
        grads, metrics = jax.grad(loss_fn, has_aux=True)(
            params, traj, advantages, targets
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, metrics

    @jax.jit
    def train_step(state: TrainState) -> tuple[TrainState, dict]:
        state, traj, last_value = rollout_phase(state)
        advantages, targets = compute_gae(traj, last_value)

        params, opt_state = state.params, state.opt_state
        if config.minibatches == 1:
            # Whole-batch epochs: no permutation, no data movement.
            metrics = None
            for _ in range(config.epochs):
                params, opt_state, metrics = sgd_step(
                    params, opt_state, traj, advantages, targets)
        else:
            # RLlib-style SGD: flatten (T, E) → B, shuffle per epoch, split
            # into minibatches (scripts/train.py trains through RLlib PPO's
            # minibatched SGD; multigrid/scripts/train.py:126-169).
            t, e = advantages.shape[:2]
            b = t * e
            assert b % config.minibatches == 0, (
                f'rollout batch {b} not divisible by '
                f'{config.minibatches} minibatches')
            key, k_perm = jax.random.split(state.key)
            state = state.replace(key=key)
            batch = jax.tree.map(
                lambda x: x.reshape((b,) + x.shape[2:]),
                (traj, advantages, targets),
            )

            def epoch_body(carry, ek):
                params, opt_state = carry
                perm = jax.random.permutation(ek, b)
                mb = jax.tree.map(
                    lambda x: jnp.take(x, perm, axis=0).reshape(
                        (config.minibatches, -1) + x.shape[1:]),
                    batch,
                )

                def mb_body(carry, data):
                    params, opt_state = carry
                    tr, adv, tg = data
                    params, opt_state, m = sgd_step(
                        params, opt_state, tr, adv, tg)
                    return (params, opt_state), m

                (params, opt_state), ms = jax.lax.scan(
                    mb_body, (params, opt_state), mb)
                return (params, opt_state), jax.tree.map(
                    lambda x: x[-1], ms)

            (params, opt_state), ms = jax.lax.scan(
                epoch_body, (params, opt_state),
                jax.random.split(k_perm, config.epochs),
            )
            metrics = jax.tree.map(lambda x: x[-1], ms)

        metrics['reward_per_step'] = traj.reward.mean()
        # Mean episode return (all agents' rewards summed per episode, the
        # RLlib episode_reward_mean convention) estimated over the batch:
        # total reward / episodes completed in the rollout window.
        env_done = traj.done.all(-1)
        n_eps = env_done.sum()
        metrics['episodes_in_batch'] = n_eps.astype(jnp.float32)
        metrics['episode_reward'] = jnp.where(
            n_eps > 0, traj.reward.sum() / jnp.maximum(n_eps, 1), jnp.nan)
        state = state.replace(
            params=params, opt_state=opt_state,
            update_count=state.update_count + 1,
        )
        return state, metrics

    return train_step


def make_train_loop(
    venv: VectorEnv,
    net: ActorCritic,
    config: PPOConfig,
    tx: optax.GradientTransformation,
    updates_per_call: int,
    per_agent_policies: bool | None = None,
) -> Callable[[TrainState], tuple[TrainState, dict]]:
    """``updates_per_call`` PPO updates fused into one jitted scan.

    Amortizes per-call dispatch overhead (significant on remote TPU
    backends) and lets XLA pipeline consecutive updates. Returned metrics
    are the mean over the scanned updates.
    """
    train_step = make_train_step(
        venv, net, config, tx, per_agent_policies=per_agent_policies)

    @jax.jit
    def train_loop(state: TrainState) -> tuple[TrainState, dict]:
        def body(s, _):
            s, metrics = train_step(s)
            return s, metrics

        state, metrics = jax.lax.scan(
            body, state, None, length=updates_per_call)
        # nanmean: episode_reward is NaN for updates whose rollout window
        # completed no episodes.
        return state, jax.tree.map(lambda m: jnp.nanmean(m), metrics)

    return train_loop
