"""CLI argument-parsing / config-building smoke tests (C1).

The flag surface keeps growing; these catch wiring regressions (a flag that
parses but never reaches the config) without running the heavy CLIs.
"""

from kgtpu.config import (
    build_eval_parser,
    build_test_parser,
    build_train_parser,
    config_from_test_args,
    config_from_train_args,
)


def test_train_flags_reach_config():
    args = build_train_parser().parse_args([
        "--dataset", "synthetic_crowded", "--input_size", "256",
        "--backbone", "resnet_fpn", "--norm", "batch", "--decode", "centernet",
        "--batch_size", "4", "--lr", "1e-3", "--lr_schedule", "cosine",
        "--num_epochs", "7", "--steps_per_epoch", "11", "--ema_decay", "0.99",
        "--remat", "--ngpus", "4", "--seed", "5", "--K", "64",
        "--max_detections", "96", "--conf_thresh", "0.2", "--nms_iou", "0.4",
        "--max_box_size", "80", "--save_dir", "/tmp/w", "--resume",
        "--aug_scale", "0.6,1.5", "--aug_rotate", "15", "--eval_every", "5",
    ])
    cfg = config_from_train_args(args)
    assert cfg.train.eval_every_epochs == 5
    assert cfg.data.scale_range == (0.6, 1.5)
    assert cfg.data.rotate_deg == 15.0
    assert cfg.data.dataset == "synthetic_crowded"
    assert cfg.data.input_size == 256
    assert cfg.model.backbone == "resnet_fpn"
    assert cfg.model.norm == "batch"
    assert cfg.model.use_wh_head and cfg.group.method == "centernet"
    assert cfg.model.remat
    assert cfg.train.batch_size == 4 and cfg.train.lr == 1e-3
    assert cfg.train.lr_schedule == "cosine"
    assert cfg.train.num_epochs == 7 and cfg.train.steps_per_epoch == 11
    assert cfg.train.ema_decay == 0.99
    assert cfg.train.num_devices == 4 and cfg.train.seed == 5
    assert cfg.group.max_peaks_per_class == 64
    assert cfg.group.max_detections == 96
    assert cfg.group.max_box_size == 80 / cfg.data.stride
    assert cfg.group.score_thresh == 0.2 and cfg.group.nms_iou == 0.4
    assert cfg.train.save_dir == "/tmp/w" and cfg.train.resume == "latest"


def test_aug_scale_rejects_bad_ranges():
    import pytest
    for bad in ("1.2,0.8", "0,1.2", "nope", "1.0"):
        args = build_train_parser().parse_args(["--aug_scale", bad])
        with pytest.raises(SystemExit):
            config_from_train_args(args)


def test_test_flags_reach_config():
    args = build_test_parser().parse_args([
        "--dataset", "dsb2018", "--data_dir", "/d", "--weights", "/w",
        "--use_ema", "--test_scales", "0.75,1.0,1.25", "--test_flip",
        "--batch_size", "16", "--save_vis", "--tiled", "--tile_size", "256",
        "--tile_overlap", "96", "--input_size", "1024", "--norm", "batch",
    ])
    cfg = config_from_test_args(args)
    assert cfg.data.dataset == "dsb2018" and cfg.data.data_dir == "/d"
    assert cfg.infer.weights == "/w"
    assert cfg.infer.test_scales == (0.75, 1.0, 1.25)
    assert cfg.infer.test_flip
    assert cfg.infer.batch_size == 16
    assert cfg.infer.tile_size == 256 and cfg.infer.tile_overlap == 96
    assert cfg.infer.input_size == 1024
    assert cfg.model.norm == "batch"
    assert args.use_ema and args.save_vis and args.tiled


def test_max_box_size_zero_means_unlimited():
    args = build_test_parser().parse_args([])
    cfg = config_from_test_args(args)
    assert cfg.group.max_box_size >= 1e9


def test_eval_parser():
    args = build_eval_parser().parse_args(
        ["--pred_dir", "/p", "--protocol", "coco"])
    assert args.pred_dir == "/p" and args.protocol == "coco"


def test_config_json_roundtrip():
    import dataclasses

    from kgtpu.config import (Config, ModelConfig, config_from_json,
                              config_to_json, tiny_test_config)

    for cfg in (Config(), tiny_test_config(),
                dataclasses.replace(
                    tiny_test_config(),
                    model=ModelConfig(backbone="resnet_fpn", norm="batch",
                                      use_wh_head=False, num_stacks=3))):
        assert config_from_json(config_to_json(cfg)) == cfg


def test_checkpoint_config_encode_decode():
    from kgtpu import checkpoint
    from kgtpu.config import tiny_test_config

    cfg = tiny_test_config()
    blob = checkpoint.encode_config(cfg)
    assert checkpoint.decode_config({"config_json": blob}) == cfg
    assert checkpoint.decode_config({}) is None       # pre-r3 checkpoint


def test_explicit_cli_dests_and_model_overrides():
    import dataclasses

    from kgtpu.config import (ModelConfig, apply_model_overrides,
                              explicit_cli_dests)

    parser = build_test_parser()
    explicit = explicit_cli_dests(
        parser, ["--backbone", "resnet_fpn", "--roi_size", "16",
                 "--weights", "/w"])
    assert {"backbone", "roi_size", "weights"} <= explicit
    assert "num_stacks" not in explicit and "norm" not in explicit

    stored = ModelConfig(backbone="hourglass_lite", num_stacks=1,
                         base_channels=48, hg_depth=3, norm="batch",
                         roi_size=8, mask_size=16)
    args = parser.parse_args(["--backbone", "resnet_fpn", "--roi_size", "16",
                              "--weights", "/w"])
    merged = apply_model_overrides(stored, args, explicit)
    # explicit flags override; everything else keeps the trained values
    assert merged.backbone == "resnet_fpn"
    assert merged.roi_size == 16 and merged.mask_size == 32
    assert merged.num_stacks == 1 and merged.base_channels == 48
    assert merged.hg_depth == 3 and merged.norm == "batch"
    # nothing explicit -> stored config untouched
    args_d = parser.parse_args(["--weights", "/w"])
    assert apply_model_overrides(
        stored, args_d, explicit_cli_dests(parser, ["--weights", "/w"])
    ) == stored


def test_decode_flag_does_not_clobber_trained_wh_head():
    """Regression: `--decode kg` (restating the default) on a checkpoint
    trained WITHOUT a wh head must not force the parser-default wh_head=1
    onto the rebuilt model; `--decode centernet` still requires the head."""
    from kgtpu.config import (ModelConfig, apply_model_overrides,
                              explicit_cli_dests)

    parser = build_test_parser()
    stored = ModelConfig(use_wh_head=False)

    argv = ["--weights", "/w", "--decode", "kg"]
    merged = apply_model_overrides(
        stored, parser.parse_args(argv), explicit_cli_dests(parser, argv))
    assert merged.use_wh_head is False

    argv = ["--weights", "/w", "--decode", "centernet"]
    merged = apply_model_overrides(
        stored, parser.parse_args(argv), explicit_cli_dests(parser, argv))
    assert merged.use_wh_head is True

    argv = ["--weights", "/w", "--wh_head", "0"]
    merged = apply_model_overrides(
        ModelConfig(use_wh_head=True), parser.parse_args(argv),
        explicit_cli_dests(parser, argv))
    assert merged.use_wh_head is False
