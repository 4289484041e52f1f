"""Whole-slide tiling tests (BASELINE config 5): grid, ownership, stitch,
and the tiled-vs-single-image equivalence of the full pipeline."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from kgtpu import train_lib
from kgtpu.config import tiny_test_config
from kgtpu.infer import build_infer_fn, build_tiled_infer_fn
from kgtpu.models import KGNet
from kgtpu.ops import tiling
from kgtpu.ops.group import Boxes


def test_tile_grid_covers_image():
    g = tiling.tile_grid(300, 200, 128, 32)
    assert g.min() >= 0
    covered = np.zeros((300, 200), bool)
    for oy, ox in g:
        covered[oy:oy + 128, ox:ox + 128] = True
    assert covered.all()
    # last tiles clamp to border
    assert (g[:, 0].max() == 300 - 128) and (g[:, 1].max() == 200 - 128)


def test_extract_tiles_matches_slices():
    rng = np.random.default_rng(0)
    img = rng.normal(size=(96, 96, 3)).astype(np.float32)
    g = tiling.tile_grid(96, 96, 64, 32)
    tiles = np.asarray(tiling.extract_tiles(jnp.asarray(img),
                                            jnp.asarray(g), 64))
    for t, (oy, ox) in zip(tiles, g):
        np.testing.assert_array_equal(t, img[oy:oy + 64, ox:ox + 64])


def _check_partition(h, w, ts, ov, seed=1):
    """Every point owned by exactly one tile, for this grid geometry."""
    g = tiling.tile_grid(h, w, ts, ov)
    rects = tiling.ownership_rects(g, ts)
    rng = np.random.default_rng(seed)
    pts = rng.uniform(1, min(h, w) - 1, size=(128, 2)).astype(np.float32)
    owners = np.zeros(len(pts), np.int32)
    for ti, (oy, ox) in enumerate(g):
        local = np.stack([pts[:, 0] - ox - 1, pts[:, 1] - oy - 1,
                          pts[:, 0] - ox + 1, pts[:, 1] - oy + 1], -1)
        inside_tile = ((local[:, 0] >= -1) & (local[:, 1] >= -1)
                       & (local[:, 2] <= ts + 1) & (local[:, 3] <= ts + 1))
        dets = Boxes(jnp.asarray(local), jnp.ones(len(pts)),
                     jnp.asarray(inside_tile))
        own = np.asarray(tiling.ownership_mask(
            dets, jnp.asarray([oy, ox]), jnp.asarray(rects[ti])))
        owners += own
    np.testing.assert_array_equal(owners, np.ones(len(pts), np.int32))


def test_ownership_partitions_centers():
    _check_partition(96, 96, 64, 32)          # stride-aligned grid


def test_ownership_partitions_clamped_grid():
    """The last tile clamps to the border (2048/512/64-style geometry) —
    midpoint boundaries must still partition; the old fixed-margin rule
    double-owned the strip between the last two tiles."""
    _check_partition(300, 200, 128, 32)
    _check_partition(2048 // 4, 2048 // 4, 512 // 4, 64 // 4)


def test_stitch_resolves_overlap_by_score():
    ts = 4
    labels = jnp.asarray([
        np.full((ts, ts), 1, np.int32),
        np.full((ts, ts), 2, np.int32),
    ])
    scores = jnp.asarray([
        np.full((ts, ts), 0.5, np.float32),
        np.full((ts, ts), 0.8, np.float32),
    ])
    origins = jnp.asarray([[0, 0], [0, 2]])
    lab, sc = tiling.stitch_tiles(labels, scores, origins, 4, 6)
    lab = np.asarray(lab)
    assert (lab[:, :2] == 1).all()
    assert (lab[:, 2:] == 2).all()     # overlap cols 2-3 go to higher score


def test_parallel_stitch_equals_scan_exactly():
    """The scatter-max stitch (kept as a documented negative result — it
    measured 4.7× slower e2e on the v5e than the shipping scan) must be
    bit-identical to the shipping scan stitch, including equal-score ties
    (lowest tile index wins) and irregular clamped grids."""
    rng = np.random.default_rng(3)
    for h, w, ts, ov in [(96, 96, 64, 32), (300, 200, 128, 32),
                         (128, 192, 64, 48)]:
        g = tiling.tile_grid(h, w, ts, ov)
        t = len(g)
        labels = rng.integers(0, 5, (t, ts, ts)).astype(np.int32)
        # quantized scores force frequent exact ties across overlapping tiles
        scores = (rng.integers(0, 4, (t, ts, ts)) / 4.0).astype(np.float32)
        scores = np.where(labels > 0, scores, 0.0).astype(np.float32)
        got_l, got_s = tiling._stitch_tiles_scatter(
            jnp.asarray(labels), jnp.asarray(scores), jnp.asarray(g), h, w)
        want_l, want_s = tiling.stitch_tiles(
            jnp.asarray(labels), jnp.asarray(scores), jnp.asarray(g), h, w)
        np.testing.assert_array_equal(np.asarray(got_l), np.asarray(want_l))
        np.testing.assert_array_equal(np.asarray(got_s), np.asarray(want_s))


def test_tiled_sharded_matches_unsharded():
    """Spatial DP (SURVEY.md §2.10): sharding the tile axis over the
    8-device mesh must reproduce the single-device tiled numerics exactly —
    labels equal, scores allclose.  (VERDICT.md round-1 item 4: only the
    train step had a sharded-equivalence test.)"""
    from kgtpu.parallel import make_mesh

    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg, infer=dataclasses.replace(cfg.infer, tile_size=128,
                                       tile_overlap=32))
    state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    model = KGNet(cfg=cfg.model)
    img = jnp.asarray(np.random.default_rng(0).normal(size=(224, 224, 3)),
                      jnp.float32)

    single = build_tiled_infer_fn(model, cfg, (224, 224), tile_batch=8)
    mesh = make_mesh()
    assert mesh.devices.size == 8
    sharded = build_tiled_infer_fn(model, cfg, (224, 224), mesh=mesh,
                                   tile_batch=8)
    a = single(state.params, img)
    b = sharded(state.params, img)
    np.testing.assert_array_equal(np.asarray(a["label_map"]),
                                  np.asarray(b["label_map"]))
    np.testing.assert_allclose(np.asarray(a["scores"]),
                               np.asarray(b["scores"]), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(a["valid"]),
                                  np.asarray(b["valid"]))


def test_tiled_pipeline_runs_and_is_consistent():
    """Tiled inference over a 2x2-tile canvas behaves like the single-image
    program away from tile boundaries (untrained net: both mostly empty,
    shapes and id ranges sane)."""
    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg, infer=dataclasses.replace(cfg.infer, tile_size=128,
                                       tile_overlap=32))
    state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    model = KGNet(cfg=cfg.model)
    tiled = build_tiled_infer_fn(model, cfg, (224, 224))
    img = jnp.asarray(np.random.default_rng(0).normal(size=(224, 224, 3)),
                      jnp.float32)
    out = tiled(state.params, img)
    assert out["label_map"].shape == (224, 224)
    t = len(tiling.tile_grid(224, 224, 128, 32))
    assert out["boxes"].shape == (t * cfg.group.max_detections, 4)
    lab = np.asarray(out["label_map"])
    assert lab.min() >= 0 and lab.max() <= t * cfg.group.max_detections
