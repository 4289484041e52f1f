"""Dataset registry keyed by the `--dataset` CLI flag.  [SURVEY.md C1-C2]"""

from __future__ import annotations

from kgtpu.config import DataConfig


def build_dataset(cfg: DataConfig, split: str = "train"):
    if cfg.dataset in ("synthetic", "synthetic_crowded", "synthetic_hard"):
        from kgtpu.data.synthetic import SyntheticCells
        n = {"train": cfg.synthetic_train_images,
             "val": 16, "test": 16}.get(split, 16)
        seed = {"train": 0, "val": 7, "test": 13}.get(split, 7)
        return SyntheticCells(size=cfg.input_size, num_images=n, seed=seed,
                              crowded=cfg.dataset.endswith("crowded"),
                              hard=cfg.dataset.endswith("hard"))
    if cfg.dataset == "dsb2018":
        from kgtpu.data.dsb2018 import DSB2018
        return DSB2018(cfg.data_dir, split=split)
    if cfg.dataset == "neural_cells":
        from kgtpu.data.neural_cells import NeuralCells
        return NeuralCells(cfg.data_dir, split=split)
    if cfg.dataset == "coco":
        from kgtpu.data.coco import CocoDataset
        return CocoDataset(cfg.data_dir, split=split)
    if cfg.dataset == "folder":
        from kgtpu.data.folder import ImageFolder
        return ImageFolder(cfg.data_dir, split=split)
    raise ValueError(f"unknown dataset: {cfg.dataset}")
