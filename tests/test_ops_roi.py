"""Tests for ROI crop (C12) and mask paste (C13), incl. cv2 parity (OPEN-10)."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from kgtpu.ops.roi import crop_and_resize, paste_masks
from tests.golden import oracles


def test_crop_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    img = rng.normal(size=(24, 31, 3)).astype(np.float32)
    boxes = np.array(
        [[2.0, 3.0, 20.0, 15.0],
         [0.0, 0.0, 31.0, 24.0],
         [5.5, 7.25, 9.5, 12.75]], np.float32)
    got = np.asarray(jax.jit(lambda i, b: crop_and_resize(i, b, 8))(
        jnp.asarray(img), jnp.asarray(boxes)))
    want = oracles.crop_and_resize(img, boxes, 8)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_crop_full_image_matches_cv2_resize():
    """Half-pixel convention check: full-image box == cv2.INTER_LINEAR resize
    (image-edge clamp and crop-edge clamp coincide for the full-image box)."""
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, size=(32, 32, 3)).astype(np.float32)
    h, w = img.shape[:2]
    r = 16
    got = np.asarray(crop_and_resize(
        jnp.asarray(img), jnp.asarray([[0.0, 0.0, float(w), float(h)]]), r))[0]
    want = cv2.resize(img, (r, r), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_crop_nearest_preserves_label_ids():
    labels = np.zeros((16, 16, 1), np.int32)
    labels[4:12, 4:12] = 7
    got = np.asarray(crop_and_resize(
        jnp.asarray(labels.astype(np.float32)),
        jnp.asarray([[4.0, 4.0, 12.0, 12.0]]), 8, method="nearest"))[0]
    assert set(np.unique(got)) == {7.0}


def test_paste_roundtrip_recovers_mask():
    """crop → paste is identity up to bilinear blur on a blob mask."""
    h = w = 48
    gt = np.zeros((h, w), np.float32)
    cv2.circle(gt, (22, 30), 9, 1.0, -1)
    box = np.array([[10.0, 18.0, 34.0, 42.0]], np.float32)   # contains circle
    crop = crop_and_resize(jnp.asarray(gt[..., None]), jnp.asarray(box), 16)[..., 0]
    label, score = paste_masks(
        crop, jnp.asarray(box), jnp.asarray([0.9]),
        jnp.asarray([True]), h, w, thresh=0.5)
    got = np.asarray(label) == 1
    inter = (got & (gt > 0.5)).sum()
    union = (got | (gt > 0.5)).sum()
    assert inter / union > 0.9


def test_paste_overlap_resolves_by_score():
    h = w = 32
    masks = jnp.ones((2, 8, 8), jnp.float32)
    boxes = jnp.asarray(np.array([[4, 4, 20, 20], [12, 12, 28, 28]], np.float32))
    label, score = paste_masks(masks, boxes, jnp.asarray([0.5, 0.8]),
                               jnp.asarray([True, True]), h, w)
    lab = np.asarray(label)
    assert lab[16, 16] == 2        # overlap pixel → higher-scoring instance 2
    assert lab[6, 6] == 1
    assert lab[26, 26] == 2
    assert lab[0, 0] == 0


def test_paste_masks_batch_matches_vmapped():
    """paste_masks_batch (batch-level chunk-skipping scan, the round-3
    latency fix for the roofline's 5%-of-HBM-bound paste stage) must equal
    vmap(paste_masks) exactly: prefix-compacted valid, scattered valid,
    empty images, duplicate scores (lowest-index tie-break), and chunk
    sizes that do and don't divide D."""
    from kgtpu.ops.roi import paste_masks_batch

    rng = np.random.default_rng(7)
    b, d, r, h, w = 3, 20, 8, 40, 48
    masks = jnp.asarray(rng.uniform(0, 1, (b, d, r, r)).astype(np.float32))
    boxes = np.zeros((b, d, 4), np.float32)
    boxes[..., 0] = rng.uniform(-4, w - 8, (b, d))
    boxes[..., 1] = rng.uniform(-4, h - 8, (b, d))
    boxes[..., 2] = boxes[..., 0] + rng.uniform(4, 16, (b, d))
    boxes[..., 3] = boxes[..., 1] + rng.uniform(4, 16, (b, d))
    # duplicate scores to exercise the lowest-index tie-break
    scores = rng.choice([0.9, 0.7, 0.7, 0.5], (b, d)).astype(np.float32)
    valid = np.zeros((b, d), bool)
    valid[0, :5] = True                   # prefix
    valid[1, [3, 17]] = True              # scattered (last chunk active)
    # image 2 stays empty
    boxes_j, scores_j, valid_j = map(jnp.asarray, (boxes, scores, valid))

    ref_l, ref_s = jax.vmap(
        lambda m, bx, sc, v: paste_masks(m, bx, sc, v, h, w)
    )(masks, boxes_j, scores_j, valid_j)
    for chunk in (4, 7, 32):
        got_l, got_s = paste_masks_batch(masks, boxes_j, scores_j, valid_j,
                                         h, w, box_chunk=chunk)
        np.testing.assert_array_equal(np.asarray(got_l), np.asarray(ref_l),
                                      err_msg=f"chunk={chunk}")
        np.testing.assert_allclose(np.asarray(got_s), np.asarray(ref_s),
                                   rtol=0, atol=0, err_msg=f"chunk={chunk}")

    # per-image id_base (the tiled path's tile_idx*D offsets)
    ib = jnp.asarray([0, 100, 40], jnp.int32)
    ref_l2, _ = jax.vmap(
        lambda m, bx, sc, v, o: paste_masks(m, bx, sc, v, h, w, id_base=o)
    )(masks, boxes_j, scores_j, valid_j, ib)
    got_l2, _ = paste_masks_batch(masks, boxes_j, scores_j, valid_j,
                                  h, w, box_chunk=7, id_base=ib)
    np.testing.assert_array_equal(np.asarray(got_l2), np.asarray(ref_l2))


def test_paste_ignores_invalid():
    label, _ = paste_masks(
        jnp.ones((1, 4, 4)), jnp.asarray([[2.0, 2.0, 10.0, 10.0]]),
        jnp.asarray([0.9]), jnp.asarray([False]), 16, 16)
    assert int(jnp.max(label)) == 0
