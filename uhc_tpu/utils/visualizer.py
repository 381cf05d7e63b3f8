"""Headless trajectory visualizer — the CopycatVisualizer / MjViewer
replacement (reference uhc/utils/copycat_visualizer.py:19,
uhc/khrylib/rl/envs/common/mjviewer.py).

The reference renders interactively through GLFW/OpenGL; on a headless TPU
host the useful artifact is a video/image dump. `render_comparison` draws
expert and simulated skeletons side by side (the export_vis_string
two-humanoid scene, smpl_robot.py:1490) from qpos trajectories via the same
FK the env uses — no OpenGL, just matplotlib 3D stick figures.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

from uhc_tpu.smpl.constants import MUJOCO_PARENTS


def _draw_skeleton(ax, jpos: np.ndarray, color: str, label: str = ""):
    parents = np.asarray(MUJOCO_PARENTS)
    for i in range(1, len(parents)):
        p = parents[i]
        ax.plot([jpos[p, 0], jpos[i, 0]], [jpos[p, 1], jpos[i, 1]],
                [jpos[p, 2], jpos[i, 2]], color=color, linewidth=2)
    ax.scatter(jpos[:, 0], jpos[:, 1], jpos[:, 2], color=color, s=8,
               label=label or None)


def render_frame(ax, pred_jpos: np.ndarray,
                 gt_jpos: Optional[np.ndarray] = None,
                 offset: float = 1.0, vf: Optional[np.ndarray] = None,
                 vf_scale: float = 0.005):
    """One frame: simulated skeleton (blue) + expert shifted by `offset`
    along +y (green), like the side-by-side vis scene.

    `vf` renders residual-force arrows (copycat_visualizer.py:106
    render_virtual_force): either a 6-dim implicit root wrench (arrow at the
    root, linear part) or an (nb, 3)-per-body explicit force field."""
    ax.clear()
    _draw_skeleton(ax, pred_jpos, "tab:blue", "sim")
    if gt_jpos is not None:
        g = np.array(gt_jpos, copy=True)
        g[:, 1] += offset
        _draw_skeleton(ax, g, "tab:green", "expert")
    if vf is not None:
        vf = np.asarray(vf)
        if vf.ndim == 1:                       # implicit: root wrench
            origins = pred_jpos[0:1]
            forces = vf[None, 0:3]
        else:                                   # explicit: per-body forces
            origins = pred_jpos[: len(vf)]
            forces = vf[:, :3]
        mag = np.linalg.norm(forces, axis=1)
        keep = mag > 1e-6
        if np.any(keep):
            o, f = origins[keep], forces[keep] * vf_scale
            ax.quiver(o[:, 0], o[:, 1], o[:, 2], f[:, 0], f[:, 1], f[:, 2],
                      color="deepskyblue", linewidth=2)
    center = pred_jpos[0]
    ax.set_xlim(center[0] - 1.2, center[0] + 1.2)
    ax.set_ylim(center[1] - 1.2, center[1] + 1.2 + offset)
    ax.set_zlim(0, 2.0)
    ax.set_box_aspect((1, 1 + offset / 2.4, 0.8))


def render_comparison(pred_jpos_seq: np.ndarray,
                      gt_jpos_seq: Optional[np.ndarray] = None,
                      out_path: str = "out.mp4", fps: int = 30,
                      stride: int = 1,
                      vf_seq: Optional[np.ndarray] = None) -> str:
    """Render a (T, nb, 3) joint-position trajectory (optionally vs the
    expert) to mp4/gif/png-frames, whichever the extension selects."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib import animation

    pred = np.asarray(pred_jpos_seq).reshape(len(pred_jpos_seq), -1, 3)
    gt = (np.asarray(gt_jpos_seq).reshape(len(gt_jpos_seq), -1, 3)
          if gt_jpos_seq is not None else None)
    frames = range(0, len(pred), stride)

    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(projection="3d")

    vfs = np.asarray(vf_seq) if vf_seq is not None else None

    if out_path.endswith(".png"):
        base, _ = os.path.splitext(out_path)
        for t in frames:
            render_frame(ax, pred[t], None if gt is None else gt[t],
                         vf=None if vfs is None else vfs[t])
            fig.savefig(f"{base}_{t:04d}.png", dpi=80)
        plt.close(fig)
        return f"{base}_*.png"

    def update(t):
        render_frame(ax, pred[t], None if gt is None else gt[t],
                     vf=None if vfs is None else vfs[t])
        return []

    anim = animation.FuncAnimation(fig, update, frames=list(frames),
                                   interval=1000 / fps, blit=False)
    writer = ("pillow" if out_path.endswith(".gif") else "ffmpeg")
    try:
        anim.save(out_path, writer=writer, fps=max(fps // stride, 1))
    except (RuntimeError, ValueError):
        # no ffmpeg on host: fall back to gif
        out_path = os.path.splitext(out_path)[0] + ".gif"
        anim.save(out_path, writer="pillow", fps=max(fps // stride, 1))
    plt.close(fig)
    return out_path


def display_coverage(results: dict, out_path: str = "coverage.png",
                     metric: str = "mpjpe") -> str:
    """Per-key coverage grid — the headless twin of
    copycat_visualizer.display_coverage (copycat_visualizer.py:19): one cell
    per evaluated sequence, green = succ, red = fail, annotated with the
    chosen metric. `results` = {key: {"succ": bool/float, metric: float}}
    (the eval CLI's per-sequence dict)."""
    import math

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    keys = sorted(results)
    n = len(keys)
    cols = max(1, int(math.ceil(math.sqrt(n))))
    rows = int(math.ceil(n / cols))
    fig, axes = plt.subplots(rows, cols,
                             figsize=(2.6 * cols, 1.3 * rows), squeeze=False)
    for i, k in enumerate(keys):
        ax = axes[i // cols][i % cols]
        m = results[k]
        ok = bool(m.get("succ", 0))
        ax.set_facecolor("#d3f2d3" if ok else "#f6c9c9")
        val = m.get(metric)
        txt = k if len(k) <= 24 else k[:21] + "..."
        ax.text(0.5, 0.62, txt, ha="center", va="center", fontsize=7,
                transform=ax.transAxes)
        if val is not None:
            ax.text(0.5, 0.25, f"{metric}={val:.1f}", ha="center",
                    va="center", fontsize=7, transform=ax.transAxes)
        ax.set_xticks([])
        ax.set_yticks([])
    for j in range(n, rows * cols):
        axes[j // cols][j % cols].axis("off")
    succ = sum(bool(results[k].get("succ", 0)) for k in keys)
    fig.suptitle(f"coverage {succ}/{n}", fontsize=10)
    fig.tight_layout()
    fig.savefig(out_path, dpi=100)
    plt.close(fig)
    return out_path


def render_eval_result(topo, model, pred_qpos_seq, gt_qpos_seq=None,
                       out_path: str = "out.gif", **kw) -> str:
    """FK the qpos trajectories with the env's own kinematics and render."""
    import jax
    import jax.numpy as jnp

    from uhc_tpu.physics import engine as E

    fk = jax.jit(jax.vmap(lambda q: E.fk(topo, model, q)["xpos"]))
    pred_j = np.asarray(fk(jnp.asarray(pred_qpos_seq)))
    gt_j = (np.asarray(fk(jnp.asarray(gt_qpos_seq)))
            if gt_qpos_seq is not None else None)
    return render_comparison(pred_j, gt_j, out_path, **kw)
