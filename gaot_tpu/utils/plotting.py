"""Result visualization.

Equivalents of the reference plotting module (src/utils/plotting.py:48-577):
- :func:`plot_estimates` — per-variable scatter panels of input / ground
  truth / prediction / absolute error over the point cloud,
- :func:`create_sequential_animation` — GIF of ground truth vs prediction vs
  error over rollout steps,
- :func:`plot_losses` — train/val loss curves (reference
  src/core/base_trainer.py:227-272).

Matplotlib with the Agg backend; all inputs are NumPy.
"""
from __future__ import annotations

from typing import Optional, Sequence

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


def _scatter(ax, coords, values, symmetric=False, title="", s=2.0):
    if symmetric:
        vmax = np.abs(values).max() or 1.0
        sc = ax.scatter(coords[:, 0], coords[:, 1], c=values, cmap="RdBu_r",
                        vmin=-vmax, vmax=vmax, s=s)
    else:
        sc = ax.scatter(coords[:, 0], coords[:, 1], c=values, cmap="viridis", s=s)
    ax.set_title(title, fontsize=8)
    ax.set_aspect("equal")
    ax.set_xticks([])
    ax.set_yticks([])
    plt.colorbar(sc, ax=ax, fraction=0.046)


def plot_estimates(u_inp: Optional[np.ndarray], u_gtr: np.ndarray,
                   u_prd: np.ndarray, x_inp: np.ndarray,
                   x_out: Optional[np.ndarray] = None,
                   names: Optional[Sequence[str]] = None,
                   symmetric: Optional[Sequence[bool]] = None,
                   domain=None):
    """Panels: [input vars] + per output variable (gt, pred, |error|)."""
    x_out = x_inp if x_out is None else x_out
    u_gtr = np.atleast_2d(u_gtr)
    u_prd = np.atleast_2d(u_prd)
    if u_gtr.ndim == 1:
        u_gtr = u_gtr[:, None]
    n_out = u_gtr.shape[-1]
    n_inp = u_inp.shape[-1] if u_inp is not None else 0
    symmetric = list(symmetric) if symmetric is not None else [False] * max(n_out, 1)

    ncols = max(n_inp, 3)
    nrows = (1 if n_inp else 0) + n_out
    fig, axes = plt.subplots(nrows, ncols, figsize=(3 * ncols, 2.6 * nrows),
                             squeeze=False)
    for ax in axes.ravel():
        ax.axis("off")

    row = 0
    if n_inp:
        for j in range(n_inp):
            ax = axes[0, j]
            ax.axis("on")
            label = names[j] if names and j < len(names) else f"input {j}"
            _scatter(ax, x_inp, u_inp[:, j], title=f"in: {label}")
        row = 1
    for v in range(n_out):
        sym = symmetric[v] if v < len(symmetric) else False
        for col, (vals, title) in enumerate([
            (u_gtr[:, v], f"gt[{v}]"),
            (u_prd[:, v], f"pred[{v}]"),
            (np.abs(u_gtr[:, v] - u_prd[:, v]), f"|err|[{v}]"),
        ]):
            ax = axes[row + v, col]
            ax.axis("on")
            _scatter(ax, x_out, vals, symmetric=sym and col < 2, title=title)
    fig.tight_layout()
    return fig


def plot_losses(path: str, epochs, losses, val_epochs=None, val_losses=None,
                best_epoch=None, best_loss=None):
    """Loss curves + .npz dump (reference base_trainer.py:227-272)."""
    if val_losses:
        fig, ax = plt.subplots(1, 2, figsize=(12, 6))
        ax0, ax1 = ax
    else:
        fig, ax0 = plt.subplots(figsize=(8, 6))
        ax1 = None
    ax0.plot(epochs, losses)
    if best_epoch is not None:
        ax0.scatter([best_epoch], [best_loss], c="r", marker="o", label="best loss")
        ax0.legend()
    ax0.set_xlabel("Epoch")
    ax0.set_ylabel("Loss")
    ax0.set_xlim(left=0)
    if len(losses) and (np.asarray(losses) > 0).all():
        ax0.set_yscale("log")
    if ax1 is not None:
        ax1.plot(val_epochs, val_losses)
        ax1.set_xlabel("Epoch")
        ax1.set_ylabel("val loss")
        ax1.set_xlim(left=0)
        if (np.asarray(val_losses) > 0).all():
            ax1.set_yscale("log")
    fig.savefig(path)
    plt.close(fig)
    kwargs = {"epochs": epochs, "losses": losses}
    if val_losses:
        kwargs.update(val_epochs=val_epochs, val_losses=val_losses)
    np.savez(path[:-4] + ".npz", **kwargs)


def create_sequential_animation(gt_sequence: np.ndarray, pred_sequence: np.ndarray,
                                coords: np.ndarray, save_path: str,
                                input_data: Optional[np.ndarray] = None,
                                time_values: Optional[Sequence] = None,
                                interval: int = 800,
                                symmetric: Optional[Sequence[bool]] = None,
                                domain=None, names: Optional[Sequence[str]] = None,
                                colorbar_type: str = "light",
                                show_error: bool = True):
    """Rollout GIF: per frame, gt / pred / error panels for variable 0."""
    from matplotlib.animation import FuncAnimation, PillowWriter

    steps = gt_sequence.shape[0]
    ncols = 3 if show_error else 2
    fig, axes = plt.subplots(1, ncols, figsize=(3.2 * ncols, 3))
    gt0 = gt_sequence[..., 0]
    pr0 = pred_sequence[..., 0]
    vmin, vmax = float(gt0.min()), float(gt0.max())
    if vmin == vmax:
        vmin, vmax = vmin - 1, vmax + 1
    err_max = float(np.abs(gt0 - pr0).max()) or 1.0

    scs = []
    titles = ["ground truth", "prediction"] + (["|error|"] if show_error else [])
    for ax, t in zip(axes, titles):
        sc = ax.scatter(coords[:, 0], coords[:, 1], c=gt0[0], cmap="viridis",
                        vmin=vmin, vmax=vmax, s=2)
        ax.set_title(t)
        ax.set_aspect("equal")
        ax.set_xticks([])
        ax.set_yticks([])
        scs.append(sc)
    if show_error:
        scs[2].set_cmap("magma")
        scs[2].set_clim(0, err_max)

    def update(frame):
        scs[0].set_array(gt0[frame])
        scs[1].set_array(pr0[frame])
        if show_error:
            scs[2].set_array(np.abs(gt0[frame] - pr0[frame]))
        label = time_values[frame] if time_values is not None and frame < len(time_values) else frame
        fig.suptitle(f"t = {label}")
        return scs

    anim = FuncAnimation(fig, update, frames=steps, interval=interval, blit=False)
    anim.save(save_path, writer=PillowWriter(fps=max(1, 1000 // interval)))
    plt.close(fig)
