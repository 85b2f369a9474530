"""Visualization artifacts: keypoint overlays + image grids (PIL/numpy).

Equivalent of the reference viz stack (base_trainer.py:130-224 +
utils/utils.py:65-90): per-batch jpg grids of [input+landmarks | render |
zero-pose render | masked | reconstruction | loss heatmap | cycle rows].
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np


def draw_keypoints(img: np.ndarray, landmarks: np.ndarray,
                   color=(0, 255, 0), radius: int = 1) -> np.ndarray:
    """img (H,W,3) float [0,1]; landmarks (K,2) in [-1,1] NDC."""
    out = (img * 255).clip(0, 255).astype(np.uint8).copy()
    H, W = out.shape[:2]
    pts = (landmarks * (W // 2) + W // 2).astype(int)
    for x, y in pts:
        x0, x1 = max(0, x - radius), min(W, x + radius + 1)
        y0, y1 = max(0, y - radius), min(H, y + radius + 1)
        if x1 > x0 and y1 > y0:
            out[y0:y1, x0:x1] = color
    return out.astype(np.float32) / 255.0


def make_grid(images: np.ndarray, nrow: int = 1, pad: int = 2) -> np.ndarray:
    """(N,H,W,C) -> single grid image, column-major like torchvision."""
    images = np.asarray(images)
    if images.ndim == 3:
        images = images[..., None]
    if images.shape[-1] == 1:
        images = np.repeat(images, 3, axis=-1)
    N, H, W, C = images.shape
    ncol = -(-N // nrow)
    grid = np.zeros((ncol * (H + pad) + pad, nrow * (W + pad) + pad, C),
                    np.float32)
    for i in range(N):
        r, c = divmod(i, nrow)
        y, x = pad + r * (H + pad), pad + c * (W + pad)
        grid[y:y + H, x:x + W] = images[i]
    return grid


def save_image(img: np.ndarray, path: str) -> None:
    from PIL import Image

    arr = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def training_grid(
    batch: Dict[str, np.ndarray],
    outputs: Dict[str, np.ndarray],
    show_landmarks: bool = True,
) -> np.ndarray:
    """Side-by-side panel per sample (reference save_visualizations)."""
    img = np.asarray(batch["img"])
    cols: List[np.ndarray] = []
    if show_landmarks and "landmarks_mp" in outputs:
        overlaid = np.stack([
            draw_keypoints(
                draw_keypoints(im, np.asarray(gt), (0, 0, 255)),
                np.asarray(pred), (0, 255, 0),
            )
            for im, gt, pred in zip(
                img, batch["landmarks_mp"], outputs["landmarks_mp"]
            )
        ])
        cols.append(make_grid(overlaid))
    else:
        cols.append(make_grid(img))
    for key in ("rendered_img", "rendered_img_base", "rendered_img_zero",
                "masked_img", "reconstructed_img", "loss_img"):
        if outputs.get(key) is not None:
            cols.append(make_grid(np.asarray(outputs[key])))
    if "img" in batch and outputs.get("rendered_img") is not None:
        overlap = 0.7 * img + 0.3 * np.asarray(outputs["rendered_img"])
        cols.append(make_grid(overlap))
    h = max(c.shape[0] for c in cols)
    cols = [
        np.pad(c, ((0, h - c.shape[0]), (0, 0), (0, 0))) for c in cols
    ]
    return np.concatenate(cols, axis=1)
