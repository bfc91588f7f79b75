"""CLI argument surface tests (the reference's public flag names)."""

import train


def test_reference_flag_surface_parses():
    args = train.parse_args(
        [
            "--use_color", "--weight_decay", "0.0005",
            "--data_root", "data/",
            "--dataset", "scanrefer", "--test_dataset", "scanrefer",
            "--lr_decay_epochs", "50", "75",
            "--detect_intermediate", "--joint_det",
            "--use_soft_token_loss", "--use_contrastive_align",
            "--self_attend", "--augment_det", "--butd",
            "--lr", "2e-4", "--lr_backbone", "2e-3",
            "--batch_size", "12",
        ]
    )
    assert args.dataset == ["scanrefer"]
    assert args.lr_decay_epochs == [50, 75]
    assert args.butd and args.joint_det and args.augment_det
    assert args.lr == 2e-4 and args.lr_backbone == 2e-3


def test_configs_built_from_args():
    args = train.parse_args(["--dataset", "synthetic", "--butd", "--num_queries", "128"])
    model, train_cfg, data = train.build_configs(args)
    assert model.butd and model.num_queries == 128
    assert data.datasets == ("synthetic",)
    assert train_cfg.lr_decay_epochs == (50, 75)


def test_eval_flags():
    args = train.parse_args(["--eval", "--checkpoint_path", "/tmp/x", "--wo_obj_name", "/tmp/y.json"])
    assert args.eval and args.checkpoint_path == "/tmp/x"
    assert args.wo_obj_name == "/tmp/y.json"


def test_input_feature_dim_counts_all_channels():
    """input_feature_dim = 3*color + 1*height + 128*multiview
    (reference num_input_channel, train_dist_mod.py:92-96)."""
    args = train.parse_args(
        ["--dataset", "synthetic", "--use_color", "--use_height",
         "--use_multiview"]
    )
    model, _, _ = train.build_configs(args)
    assert model.input_feature_dim == 3 + 1 + 128
    args = train.parse_args(["--dataset", "synthetic", "--use_height"])
    model, _, _ = train.build_configs(args)
    assert model.input_feature_dim == 1
