"""Visualization: camera-frustum 3D plots, depth colormaps, error tables.

Parity with the reference's per-epoch observability
(``model/mc_nerf.py:388-534``, ``model/net_utils.py:205-231``):
  * GT-vs-estimated camera frustum plot saved per epoch;
  * per-epoch camera parameter absolute-error table;
  * inverse-depth colormap for rendered depth maps.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

from mc_nerf_tpu.utils.logging import format_table


def camera_error_row(
    epoch: int,
    K_gt: np.ndarray,
    K_est: np.ndarray,
    pose_gt: np.ndarray,
    pose_est: np.ndarray,
) -> list:
    """One row of the camera-error table (ref mc_nerf.py:388-407)."""
    dK = np.abs(K_gt - K_est)
    dP = np.abs(pose_gt - pose_est)
    return [
        int(epoch),
        round(float(dK[:, 0, 0].mean()), 4),
        round(float(dK[:, 1, 1].mean()), 4),
        round(float(dK[:, 0, 2].mean()), 4),
        round(float(dK[:, 1, 2].mean()), 4),
        round(float(dK.mean()), 4),
        round(float(dP[:, :3, :3].mean()), 4),
        round(float(dP[:, :3, 3:].mean()), 4),
    ]


CAMERA_TABLE_HEADERS = (
    "EPOCH", "LOSS_FX", "LOSS_FY", "LOSS_UX", "LOSS_UY", "LOSS_K", "LOSS_R", "LOSS_T"
)


def camera_error_table(rows: Sequence[list]) -> str:
    return format_table(CAMERA_TABLE_HEADERS, rows)


def apply_depth_colormap(depth01: np.ndarray, cmap: str = "inferno") -> np.ndarray:
    """[H, W] depth in [0, 1] -> [H, W, 3] colormapped float (ref
    net_utils.py:219-231; same clipping-to-[63, 255] quirk preserved for the
    demo path's look)."""
    import matplotlib

    colormap = matplotlib.colormaps[cmap]
    v = np.clip(depth01, 0.0, 1.0)
    idx = (v * 255).astype(np.int64)
    idx = np.clip(idx, 63, 255)
    table = np.asarray(colormap(np.arange(256) / 255.0))[:, :3]
    return table[idx]


def _frustum_points(pose_c2w: np.ndarray, K: np.ndarray, img_w: int, cam_size: float):
    """Five 3D points (4 image-plane corners + center) of a camera wireframe
    (ref draw_camera_shape, mc_nerf.py:499-534)."""
    focal = K[0, 0] * cam_size / img_w
    h = cam_size / 2.0
    corners = np.array(
        [[-h, -h, -focal], [-h, h, -focal], [h, h, -focal], [h, -h, -focal]]
    )
    R, t = pose_c2w[:, :3], pose_c2w[:, 3]
    world = corners @ R.T + t
    return world, t


def save_pose_plot(
    path: str,
    gt_c2w: np.ndarray,
    est_c2w: np.ndarray,
    K_gt: np.ndarray,
    K_est: np.ndarray,
    img_w: int,
    lim: float = 3.5,
) -> None:
    """GT (purple) vs estimated (teal) camera wireframes, one PNG."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(4, 4))
    ax = fig.add_subplot(projection="3d")
    for poses, Ks, color in (
        (gt_c2w, K_gt, (0.7, 0.2, 0.7)),
        (est_c2w, K_est, (0.0, 0.6, 0.7)),
    ):
        centers = []
        for i in range(poses.shape[0]):
            pts, c = _frustum_points(poses[i], Ks[i], img_w, 0.3)
            centers.append(c)
            loop = np.concatenate([pts, pts[:1]], axis=0)
            ax.plot(loop[:, 0], loop[:, 1], loop[:, 2], color=color, linewidth=0.5)
            for p in pts:
                seg = np.stack([c, p])
                ax.plot(seg[:, 0], seg[:, 1], seg[:, 2], color=color, linewidth=0.5)
        centers = np.stack(centers)
        ax.scatter(centers[:, 0], centers[:, 1], centers[:, 2], color=color, s=5)
    ax.set_xlim(-lim, lim)
    ax.set_ylim(-lim, lim)
    ax.set_zlim(-lim, lim)
    ax.grid(False)
    ax.axis("off")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fig.savefig(path, dpi=150)
    plt.close(fig)
