"""kgtpu — TPU-native keypoint-graph instance segmentation framework.

A clean-room, TPU-first rebuild of the capabilities of
``yijingru/KG_Instance_Segmentation`` (MICCAI 2019: "Multi-scale Cell Instance
Segmentation with Keypoint Graph based Bounding Boxes", arXiv:1907.09140).

Nothing here is a translation of the reference's PyTorch code (the reference
mount was empty at build time — see SURVEY.md §0); the pipeline *semantics*
follow SURVEY.md's component inventory (§2) and the paper, while the
*implementation* is idiomatic JAX/XLA: every pipeline stage — Gaussian target
rendering, peak decoding, keypoint-graph grouping, box NMS, ROI cropping, mask
pasting — is a fixed-shape, jit-compilable device op with zero host round
trips, and data parallelism is expressed with `jax.sharding` over a Mesh.

Package layout (SURVEY.md §7.1):
  config       — dataclass config + reference-style argparse shim   [C1]
  data/        — dataset readers, host augmentation, fixed-shape batching [C2,C3]
  models/      — flax backbones (hourglass, resnet-fpn), heads, mask head [C5-C7]
  ops/         — the core fixed-shape device ops                   [C4,C9-C13]
  losses       — focal / offset-L1 / mask losses                    [C8]
  train_lib    — jitted + sharded train step                        [C14]
  infer        — single-program inference, multi-scale TTA, tiling  [C15,C16]
  evaluate     — host-side mask AP                                  [C17]
  checkpoint   — orbax-backed save/load with reference-like naming  [C18]
  parallel/    — mesh construction and sharding rules               [§2.10]
  predictor    — high-level serving API (checkpoint in, instances out)
  export       — AOT serving artifacts: jax.export → StableHLO, weights baked
"""

from kgtpu.version import __version__

__all__ = ["__version__"]
