"""Rendering for FutbolEnv (SURVEY.md §2.1 #11, §3.4).

The reference draws the field, players, and ball on each ``render()`` call
(matplotlib-or-pygame, [RECALL-L]). Here rendering is a pure host-side
utility over :class:`EnvState` — it never touches the TPU hot path.
Matplotlib is used when available; otherwise an ASCII fallback keeps the
API functional in headless sandboxes.
"""

from __future__ import annotations

import numpy as np

from .types import EnvParams, EnvState


def render_state(state: EnvState, params: EnvParams, mode: str = "rgb_array"):
    """Render one env state.

    mode="rgb_array" -> HxWx3 uint8 numpy array (matplotlib if installed).
    mode="ansi"      -> ASCII art string.
    mode="human"     -> prints the ASCII frame to stdout, returns None
                        (gym convention; headless-safe stand-in for the
                        reference's on-screen draw, SURVEY.md §3.4).
    """
    if mode == "human":
        print(_ascii(state, params))
        return None
    if mode == "ansi":
        return _ascii(state, params)
    try:
        return _mpl_rgb(state, params)
    except ImportError:
        return _ascii(state, params)


def _mpl_rgb(state: EnvState, params: EnvParams) -> np.ndarray:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.patches import Circle, Rectangle

    w, h = params.width, params.height
    fig, ax = plt.subplots(figsize=(6, 6 * h / w), dpi=100)
    ax.add_patch(Rectangle((0, 0), w, h, facecolor="#2e7d32", zorder=0))
    # goal mouths
    for x0 in (-8, w):
        ax.add_patch(
            Rectangle(
                (x0, params.goal_y_lo), 8, params.goal_size,
                facecolor="white", alpha=0.6, zorder=1,
            )
        )
    ax.plot([w / 2, w / 2], [0, h], color="white", lw=1, zorder=1)

    pos = np.asarray(state.pos)
    ppt = params.players_per_team
    ax.add_patch(Circle(pos[0], params.ball_radius, color="white", zorder=3))
    for i in range(1, 1 + ppt):
        ax.add_patch(Circle(pos[i], params.player_radius, color="#1565c0", zorder=2))
    for i in range(1 + ppt, 1 + 2 * ppt):
        ax.add_patch(Circle(pos[i], params.player_radius, color="#c62828", zorder=2))

    sc = np.asarray(state.score)
    ax.set_title(f"{int(sc[0])} : {int(sc[1])}   t={int(state.t)}")
    ax.set_xlim(-10, w + 10)
    ax.set_ylim(-10, h + 10)
    ax.set_aspect("equal")
    ax.axis("off")
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[:, :, :3].copy()
    plt.close(fig)
    return buf


def render_episode(
    params: EnvParams,
    policy=None,
    seed: int = 0,
    n_steps: int | None = None,
    every: int = 1,
) -> list[np.ndarray]:
    """Roll one episode host-side and render every ``every``-th frame.

    ``policy(key, obs[1, obs_dim]) -> actions[1, n_players, 2]`` (the
    vectorized-policy convention; defaults to uniform random). Returns a
    list of HxWx3 uint8 frames. Pure debugging/inspection utility — the
    hot path never renders.
    """
    import jax

    from . import env as env_core
    from .vector import random_policy

    policy = policy or random_policy(params)
    n_steps = n_steps or params.max_steps
    key = jax.random.PRNGKey(seed)
    key, k0 = jax.random.split(key)
    state, obs = env_core.reset(k0, params)
    frames = [render_state(state, params)]
    step_fn = jax.jit(
        lambda s, a: env_core.step(s, a, params), donate_argnums=()
    )
    for i in range(n_steps):
        key, k_act = jax.random.split(key)
        actions = policy(k_act, obs[None])[0]
        state, out = step_fn(state, actions)
        obs = out.obs
        if (i + 1) % every == 0:
            frames.append(render_state(state, params))
        if bool(out.done):
            break
    return frames


def save_video(frames: list[np.ndarray], path: str, fps: int = 20) -> str:
    """Write frames to an animated GIF (PIL). Returns the path."""
    from PIL import Image

    imgs = [Image.fromarray(f) for f in frames]
    imgs[0].save(
        path, save_all=True, append_images=imgs[1:],
        duration=max(1, int(1000 / fps)), loop=0,
    )
    return path


def _ascii(state: EnvState, params: EnvParams, cols: int = 60, rows: int = 20) -> str:
    grid = [["." for _ in range(cols)] for _ in range(rows)]
    pos = np.asarray(state.pos)
    ppt = params.players_per_team

    def put(p, ch):
        c = int(np.clip(p[0] / params.width * (cols - 1), 0, cols - 1))
        r = int(np.clip((1 - p[1] / params.height) * (rows - 1), 0, rows - 1))
        grid[r][c] = ch

    for i in range(1, 1 + ppt):
        put(pos[i], "A")
    for i in range(1 + ppt, 1 + 2 * ppt):
        put(pos[i], "B")
    put(pos[0], "o")
    sc = np.asarray(state.score)
    head = f"score {int(sc[0])}:{int(sc[1])} t={int(state.t)}"
    return head + "\n" + "\n".join("".join(r) for r in grid)
