"""Serving-export tests: StableHLO artifact round-trip (kgtpu/export.py)."""

import dataclasses
import os

import jax
import numpy as np

from kgtpu import checkpoint, train_lib
from kgtpu.config import tiny_test_config
from kgtpu.export import export_infer, load_serving
from kgtpu.infer import build_infer_fn
from kgtpu.models import KGNet


def _save_tiny_ckpt(d):
    cfg = tiny_test_config()
    state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    checkpoint.save(d, epoch=0, state=state,
                    extra={"config_json": checkpoint.encode_config(cfg)})
    return cfg, state


def test_export_roundtrip_matches_live_infer(tmp_path):
    d = str(tmp_path / "w")
    tiny, state = _save_tiny_ckpt(d)
    art = str(tmp_path / "model.kgx")
    manifest = export_infer(d, art, batch=2, input_size=128)
    assert os.path.getsize(art) == manifest["bytes"] > 0
    assert manifest["input_size"] == 128
    assert "label_map" in manifest["outputs"]

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (2, 128, 128, 3), np.uint8)

    serve = load_serving(art)
    got = serve(imgs)

    # the export derives its config exactly like Predictor.from_checkpoint:
    # stored model architecture + default inference knobs (+ overrides)
    from kgtpu.config import Config
    cfg = dataclasses.replace(
        Config(), model=tiny.model,
        infer=dataclasses.replace(Config().infer, input_size=128))
    model = KGNet(cfg=cfg.model)
    infer = build_infer_fn(model, cfg)
    want = infer(state.params, imgs)

    assert set(got.keys()) == set(want.keys())
    for k in want:
        g, w = np.asarray(got[k]), np.asarray(want[k])
        if np.issubdtype(w.dtype, np.floating):
            # baking params as program constants lets XLA fold them with
            # different fp association — bit-exactness is not the contract
            np.testing.assert_allclose(g, w, rtol=1e-4, atol=1e-4,
                                       err_msg=k)
        else:
            np.testing.assert_array_equal(g, w, err_msg=k)


def test_export_rejects_bad_canvas(tmp_path):
    d = str(tmp_path / "w")
    _save_tiny_ckpt(d)
    try:
        export_infer(d, str(tmp_path / "x.kgx"), batch=1, input_size=100)
    except ValueError as e:
        assert "divisible" in str(e)
    else:
        raise AssertionError("expected ValueError on non-dividing canvas")


def test_export_tta_mode(tmp_path):
    d = str(tmp_path / "w")
    _save_tiny_ckpt(d)
    art = str(tmp_path / "tta.kgx")
    m = export_infer(d, art, batch=1, input_size=128, mode="tta",
                     test_scales=(0.75, 1.0))
    sides = {k: v[1] for k, v in m["inputs"].items()}
    assert sides["1"] == 128 and sides["0.75"] == 96  # round-to-divisor
    serve = load_serving(art)
    rng = np.random.default_rng(1)
    out = serve({k: rng.integers(0, 256, (1, s, s, 3), np.uint8)
                 for k, s in sides.items()})
    assert np.asarray(out["label_map"]).shape == (1, 128, 128)


def test_export_tiled_mode(tmp_path):
    d = str(tmp_path / "w")
    tiny, _ = _save_tiny_ckpt(d)
    art = str(tmp_path / "tiled.kgx")
    # tiny model: keep the slide small; tile_size must divide by the
    # backbone divisor — use the 128 canvas as the tile
    m = export_infer(d, art, mode="tiled", slide_hw=(192, 192),
                     input_size=128, tile_size=128)
    assert m["inputs"] == [192, 192, 3]
    serve = load_serving(art)
    rng = np.random.default_rng(2)
    out = serve(rng.integers(0, 256, (192, 192, 3), np.uint8))
    assert np.asarray(out["label_map"]).shape == (192, 192)
