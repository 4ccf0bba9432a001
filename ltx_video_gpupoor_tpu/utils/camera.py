"""ReCamMaster camera-pose embeddings.

Parity target: ``/root/reference/wan/utils/cammmaster_tools.py`` — parse a
``camera_extrinsics.json`` of preset trajectories (10 cameras x 81 frames),
compute camera-to-world poses relative to the first frame, and emit the
12-d flattened per-frame embedding the ReCamMaster blocks consume
(``wan/modules/model.py:442-455``).
"""

from __future__ import annotations

import json

import numpy as np


def parse_matrix(matrix_str: str) -> np.ndarray:
    rows = matrix_str.strip().split("] [")
    out = []
    for row in rows:
        row = row.replace("[", "").replace("]", "")
        out.append([float(x) for x in row.split()])
    return np.asarray(out)


def relative_poses(c2w_list: list[np.ndarray]) -> np.ndarray:
    """First camera becomes the identity; later cameras are expressed in its
    frame (``get_relative_pose``, ``cammmaster_tools.py:23-37``)."""
    w2c0 = np.linalg.inv(c2w_list[0])
    target = np.eye(4)
    abs2rel = target @ w2c0
    poses = [target] + [abs2rel @ c2w for c2w in c2w_list[1:]]
    return np.asarray(poses, np.float32)


def get_camera_embedding(
    cam_type: int | str,
    extrinsics_path: str,
    num_frames: int = 81,
) -> np.ndarray:
    """Returns [ceil(num_frames/4), 12] float32 pose embeddings."""
    with open(extrinsics_path) as f:
        cam_data = json.load(f)
    cam_idx = list(range(num_frames))[::4]
    traj = [
        parse_matrix(cam_data[f"frame{idx}"][f"cam{int(cam_type):02d}"])
        for idx in cam_idx
    ]
    traj = np.stack(traj).transpose(0, 2, 1)
    c2ws = []
    for c2w in traj:
        c2w = c2w[:, [1, 2, 0, 3]].copy()
        c2w[:3, 1] *= -1.0
        c2w[:3, 3] /= 100.0
        c2ws.append(c2w)
    rel = relative_poses(c2ws)  # [T, 4, 4]
    # per-frame pose relative to frame 0: rows [i] of pairwise (0, i)
    embeds = []
    for i in range(len(c2ws)):
        pair = relative_poses([c2ws[0], c2ws[i]])
        embeds.append(pair[1, :3, :])  # [3, 4]
    return np.stack(embeds).reshape(len(c2ws), 12).astype(np.float32)
