"""Policy-in-kernel self-play pieces testable on CPU (the full kernel
needs the TPU core PRNG; its statistical validation lives in
parity/check_fused_actor.py and runs on the chip)."""

import jax
import jax.numpy as jnp
import numpy as np

from gym_futbol_tpu import EnvParams
from gym_futbol_tpu.evaluate import evaluate
from gym_futbol_tpu.ops.fused_actor import (
    init_mlp,
    mlp_team_policy,
    mlp_weight_shapes,
)

P = EnvParams(players_per_team=2, substeps=2, solver_iterations=3, max_steps=20)


class TestFusedActorPieces:
    def test_weight_shapes_and_init(self, key):
        shapes = mlp_weight_shapes(P, hidden=(32, 16))
        f = 4 * P.n_bodies + 2
        assert shapes[0][0] == (f, 32)
        assert shapes[-1][0] == (16, P.players_per_team * 2 * 5)
        w = init_mlp(key, P, hidden=(32, 16))
        assert len(w) == 6
        for got, (ws, bs) in zip(zip(w[::2], w[1::2]), shapes):
            assert got[0].shape == ws and got[1].shape == bs

    def test_mlp_team_policy_plays(self, key):
        """The jnp adapter drives a full evaluation match."""
        w = init_mlp(key, P, hidden=(16,))
        res = evaluate(
            P, policy_a=mlp_team_policy(w, P), n_envs=32, n_steps=25, seed=0
        )
        assert np.isfinite(res["mean_team0_reward"])
        total = res["win_rate_a"] + res["win_rate_b"] + res["draw_rate"]
        assert np.isclose(total, 1.0, atol=1e-6)

    def test_team_policy_action_ranges(self, key):
        w = init_mlp(key, P, hidden=(16,))
        policy = mlp_team_policy(w, P)
        obs = jax.random.normal(key, (8, 4 * P.n_bodies + 2))
        a = policy(key, obs)
        assert a.shape == (8, P.players_per_team, 2)
        assert (np.asarray(a) >= 0).all() and (np.asarray(a) < 5).all()


class TestFusedCollectPieces:
    def test_flatten_actor_critic_shapes(self, key):
        """flatten_actor_critic must emit (W, b) pairs in kernel order:
        torso Denses, then logits head, then value head."""
        from gym_futbol_tpu.models.policy import ActorCritic
        from gym_futbol_tpu.models.policy import init_params
        from gym_futbol_tpu.ops.fused_collect import flatten_actor_critic

        model = ActorCritic(n_players=P.players_per_team, hidden=(32, 16))
        params = init_params(key, model, P)
        w = flatten_actor_critic(params, model)
        f = 4 * P.n_bodies + 2
        assert len(w) == 8  # 2 torso + logits + value, (W, b) each
        assert w[0].shape == (f, 32) and w[1].shape == (32, 1)
        assert w[2].shape == (32, 16) and w[3].shape == (16, 1)
        assert w[4].shape == (16, P.players_per_team * 2 * 5)  # logits head
        assert w[6].shape == (16, 1) and w[7].shape == (1, 1)  # value head
