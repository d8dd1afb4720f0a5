"""Slot-visualisation grids (reference ``slowfast/utils/slot_misc.py:16-35``).

Pure numpy make_grid; output [1, T, C, H_grid, W_grid] for
TensorboardWriter.add_video.
"""

import numpy as np


def make_grid(tiles: np.ndarray, nrow: int, pad: int = 2, pad_value: float = 0.8):
    """tiles: [N, H, W, C] -> [C, H_grid, W_grid] (torchvision-like)."""
    n, h, w, c = tiles.shape
    ncol = (n + nrow - 1) // nrow
    grid = np.full(
        (ncol * (h + pad) + pad, nrow * (w + pad) + pad, c), pad_value, np.float32
    )
    for i in range(n):
        r, col = divmod(i, nrow)
        y = r * (h + pad) + pad
        x = col * (w + pad) + pad
        grid[y : y + h, x : x + w] = tiles[i]
    return grid.transpose(2, 0, 1)


def visualize(video, recon_dvae, recon_tf, attns, num_slots=4, N=8):
    """Tile (input | dvae recon | AR recon | per-slot maps) per frame.

    Inputs are NHWC-family: video/recons [B,T,H,W,C], attns [B,T,S,H,W,C].
    Returns [1, T, C, Hg, Wg].
    """
    video = np.asarray(video)[:N]
    recon_dvae = np.asarray(recon_dvae)[:N]
    recon_tf = np.asarray(recon_tf)[:N]
    attns = np.asarray(attns)[:N]
    B, T = video.shape[:2]
    frames = []
    for t in range(T):
        tiles = np.concatenate(
            (
                video[:, t, None],
                recon_dvae[:, t, None],
                recon_tf[:, t, None],
                attns[:, t],
            ),
            axis=1,
        )  # [B, 3+S, H, W, C]
        tiles = tiles.reshape((-1,) + tiles.shape[2:])
        frames.append(make_grid(tiles, nrow=num_slots + 3))
    return np.stack(frames)[None]  # [1, T, C, Hg, Wg]
