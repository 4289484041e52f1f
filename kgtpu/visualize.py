"""Demo-output rendering.  [SURVEY.md §4: the reference's de-facto
verification is visual inspection of test.py's written masks]"""

from __future__ import annotations

import cv2
import numpy as np


def _palette(n: int) -> np.ndarray:
    rng = np.random.default_rng(42)
    cols = rng.integers(64, 255, size=(max(n, 1), 3))
    return cols.astype(np.uint8)


def draw_instances(image: np.ndarray, label_map: np.ndarray,
                   boxes: np.ndarray, scores: np.ndarray,
                   valid: np.ndarray, alpha: float = 0.45) -> np.ndarray:
    """Overlay instance masks + boxes + scores on a uint8 RGB image."""
    vis = image.copy()
    n = int(label_map.max())
    cols = _palette(n + 1)
    mask_any = label_map > 0
    color_img = cols[np.clip(label_map, 0, n)]
    vis[mask_any] = (alpha * color_img[mask_any]
                     + (1 - alpha) * vis[mask_any]).astype(np.uint8)
    for d in np.nonzero(valid)[0]:
        x0, y0, x1, y1 = boxes[d].astype(int)
        c = tuple(int(v) for v in cols[(d + 1) % len(cols)])
        cv2.rectangle(vis, (x0, y0), (x1, y1), c, 1)
        cv2.putText(vis, f"{scores[d]:.2f}", (x0, max(y0 - 3, 8)),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.35, c, 1)
    return vis


def denormalize(image: np.ndarray, mean, std) -> np.ndarray:
    """Undo DataConfig normalization → uint8 RGB."""
    img = image * np.asarray(std, np.float32) + np.asarray(mean, np.float32)
    return np.clip(img * 255.0, 0, 255).astype(np.uint8)
