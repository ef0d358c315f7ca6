"""Rendering: rgb frames, ASCII fallback, episode video export."""

import os

import numpy as np

from gym_futbol_tpu import EnvParams, FutbolEnv
from gym_futbol_tpu.render import render_episode, render_state, save_video

P = EnvParams(players_per_team=2, substeps=2, solver_iterations=3, max_steps=20)


class TestRender:
    def test_rgb_array(self):
        env = FutbolEnv(P, seed=0)
        env.reset()
        frame = env.render(mode="rgb_array")
        assert isinstance(frame, np.ndarray)
        assert frame.ndim == 3 and frame.shape[2] == 3
        assert frame.dtype == np.uint8
        # field green must dominate the frame
        assert frame.mean() > 10

    def test_ansi_has_all_bodies(self):
        env = FutbolEnv(P, seed=0)
        env.reset()
        s = render_state(env.state, P, mode="ansi")
        assert "o" in s and "A" in s and "B" in s and "score" in s

    def test_episode_video(self, tmp_path):
        frames = render_episode(P, seed=1, n_steps=6, every=2)
        assert len(frames) == 4  # initial + 3 sampled
        path = save_video(frames, str(tmp_path / "ep.gif"), fps=10)
        assert os.path.getsize(path) > 1000
