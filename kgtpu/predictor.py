"""High-level serving API: checkpoint in, instances out.

The library-user counterpart of test.py's CLI loop — one object bundling
config, weights, host pre/post-processing, and the jitted device program,
sized for production serving (fixed shapes, one compile per (H, W)):

    from kgtpu.predictor import Predictor
    p = Predictor.from_checkpoint("weights", use_ema=True)
    result = p.predict(image_uint8)         # HxWx3 RGB, any size
    result["label_map"], result["boxes"], result["scores"], result["masks"]

Boxes/label map are returned in the ORIGINAL image frame (the predictor
resizes to its canvas internally and maps results back).
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np

from kgtpu import checkpoint as ckpt
from kgtpu.config import Config
from kgtpu.data.transforms import resize_sample
from kgtpu.infer import build_infer_fn
from kgtpu.models import KGNet, required_divisor


def size_prior_fallback(cfg: Config, extra: dict) -> Config:
    """The grouper's ghost-killing size cap for checkpoints WITHOUT an
    active wh-head size gate, derived from the dataset stats stored at
    train time.  Shared by every serving consumer (Predictor, test.py's
    equivalent inline logic, kgtpu.export) so the deployment artifact
    cannot silently diverge from the live paths.  No-op when wh-head
    pruning is active (the default) or the user already set a cap."""
    side = float(extra.get("max_gt_box_side_px", 0.0))
    train_canvas = float(extra.get("train_input_size", 0.0))
    prune_active = cfg.group.size_prune > 0 and cfg.model.use_wh_head
    if (side > 0 and train_canvas > 0 and cfg.group.max_box_size >= 1e9
            and not prune_active):
        # stats are in train-canvas pixels; rescale to this canvas
        side_here = side * cfg.infer.input_size / train_canvas
        cfg = dataclasses.replace(
            cfg, group=dataclasses.replace(
                cfg.group, max_box_size=1.5 * side_here / cfg.data.stride))
    return cfg


class Predictor:
    def __init__(self, cfg: Config, params):
        div = required_divisor(cfg.model)
        if cfg.infer.input_size % div:
            raise ValueError(
                f"infer.input_size {cfg.infer.input_size} must be divisible "
                f"by {div}")
        self.cfg = cfg
        self.params = params
        self.model = KGNet(cfg=cfg.model)
        self._infer = build_infer_fn(self.model, cfg)

    @classmethod
    def from_checkpoint(cls, path: str, cfg: Config | None = None,
                        use_ema: bool = False) -> "Predictor":
        params, extra = ckpt.restore_bundle(path, use_ema=use_ema)
        if cfg is None:
            # self-describing checkpoints: rebuild the trained architecture
            # from the stored config; inference knobs stay at defaults.  An
            # explicit `cfg` argument overrides everything.
            stored = ckpt.decode_config(extra)
            cfg = Config() if stored is None else dataclasses.replace(
                Config(), model=stored.model)
        return cls(size_prior_fallback(cfg, extra), params)

    def predict(self, image: np.ndarray, score_thresh: float | None = None
                ) -> dict:
        """image: [H, W, 3] uint8 RGB (or float in [0,1]).  Returns numpy
        results mapped back to the input frame."""
        if image.dtype != np.uint8:
            image = np.clip(image * 255.0, 0, 255).astype(np.uint8)
        h0, w0 = image.shape[:2]
        canvas = self.cfg.infer.input_size
        sample = resize_sample(
            {"image": image, "label_map": np.zeros((h0, w0), np.int32)},
            canvas)
        # raw uint8 in: the jitted infer fn normalizes on device
        out = self._infer(self.params, sample["image"][None])
        scale = max(h0, w0) / canvas
        boxes = np.asarray(out["boxes"][0]) * scale
        scores = np.asarray(out["scores"][0])
        valid = np.asarray(out["valid"][0])
        if score_thresh is not None:
            valid = valid & (scores >= score_thresh)
        # label map back to original resolution (nearest keeps ids intact).
        # Renumber so id k+1 indexes row k of the compacted boxes/scores/
        # masks arrays: filtered/suppressed slots leave holes in `valid`,
        # so raw slot ids would misindex the compacted outputs.
        import cv2
        lab = np.asarray(out["label_map"][0]).astype(np.int32)
        lut = np.zeros(len(valid) + 1, np.int32)
        lut[1:][valid] = np.arange(1, int(valid.sum()) + 1)
        lab = lut[lab].astype(np.uint16)
        span_h, span_w = round(h0 / scale), round(w0 / scale)
        lab = cv2.resize(lab[:span_h, :span_w], (w0, h0),
                         interpolation=cv2.INTER_NEAREST).astype(np.int32)
        return {
            "boxes": boxes[valid],
            "scores": scores[valid],
            "masks": np.asarray(out["masks"][0])[valid],
            "label_map": lab,
            "num_instances": int(valid.sum()),
        }
