#!/usr/bin/env python
"""Training/evaluation entry point.

The public CLI mirrors the reference's flag surface (``main_utils.py:34-123``
+ ``train_dist_mod.py``) so the launch scripts translate 1:1:

    python train.py --dataset scanrefer --test_dataset scanrefer \
        --use_color --weight_decay 0.0005 --lr 2e-4 --lr_backbone 2e-3 \
        --butd --joint_det --augment_det --lr_decay_epochs 50 75

Differences from the reference runtime, by design:
* no torch.distributed.launch — one process drives all local devices through
  a jitted global-view step (multi-host via ``jax.distributed.initialize``);
* ``--dataset synthetic`` trains on the built-in synthetic scenes so the full
  pipeline runs without ScanNet on disk (the reference has no equivalent);
* checkpoints are orbax directories, with auto-resume from ``--log_dir``.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser("EDA-TPU trainer")
    # data
    p.add_argument("--data_root", default="data/")
    p.add_argument("--dataset", nargs="+", default=["synthetic"],
                   help="scanrefer sr3d sr3d+ nr3d scannet synthetic")
    p.add_argument("--test_dataset", default=None)
    p.add_argument("--batch_size", type=int, default=12)
    p.add_argument("--num_points", type=int, default=50000)
    p.add_argument("--use_color", action="store_true")
    p.add_argument("--use_height", action="store_true")
    p.add_argument("--use_multiview", action="store_true")
    p.add_argument("--no_augment", dest="augment", action="store_false")
    p.add_argument("--augment_det", action="store_true")
    p.add_argument("--detect_intermediate", action="store_true")
    p.add_argument("--joint_det", action="store_true")
    p.add_argument("--butd", action="store_true")
    p.add_argument("--butd_gt", action="store_true")
    p.add_argument("--butd_cls", action="store_true")
    # model
    p.add_argument("--num_queries", "--num_target", dest="num_queries",
                   type=int, default=256,
                   help="query count (the reference calls this --num_target)")
    p.add_argument("--num_encoder_layers", type=int, default=3)
    p.add_argument("--sampling", default="kps",
                   help="query sampling (only 'kps' exists, like the reference default)")
    p.add_argument("--num_decoder_layers", type=int, default=6)
    p.add_argument("--self_position_embedding", default="loc_learned")
    p.add_argument("--self_attend", action="store_true", default=True)
    p.add_argument("--use_contrastive_align", action="store_true", default=True)
    p.add_argument("--use_soft_token_loss", action="store_true", default=True)
    p.add_argument("--sa_impl", default="fused", choices=["fused", "gather"])
    p.add_argument("--use_bf16", action="store_true", default=True)
    p.add_argument("--pp_checkpoint", default=None)
    # loss
    p.add_argument("--query_points_obj_topk", type=int, default=4)
    # optimization
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--lr_backbone", type=float, default=2e-3)
    p.add_argument("--text_encoder_lr", type=float, default=2e-5)
    p.add_argument("--weight_decay", type=float, default=5e-4)
    p.add_argument("--max_epoch", type=int, default=100)
    p.add_argument("--lr_decay_epochs", type=int, nargs="+", default=[50, 75])
    p.add_argument("--lr_decay_rate", type=float, default=0.1)
    p.add_argument("--lr-scheduler", dest="lr_scheduler", default="multistep")
    p.add_argument("--warmup-epoch", dest="warmup_epoch", type=int, default=-1)
    p.add_argument("--warmup-multiplier", dest="warmup_multiplier", type=int,
                   default=100)
    p.add_argument("--clip_norm", type=float, default=0.1)
    p.add_argument("--optimizer", default="adamW",
                   help="only adamW is implemented (the reference default)")
    p.add_argument("--bn_momentum", type=float, default=0.1,
                   help="accepted for compatibility; only the reference "
                        "default 0.1 is implemented (a fixed constant)")
    p.add_argument("--syncbn", action="store_true",
                   help="accepted for compatibility; BN stats are always "
                        "global under the jitted global-view step")
    p.add_argument("--start_epoch", type=int, default=1,
                   help="accepted for compatibility; auto-resume restores "
                        "the epoch from the checkpoint")
    # io
    p.add_argument("--log_dir", default="logs/eda_tpu")
    p.add_argument("--checkpoint_path", default=None)
    p.add_argument("--save_freq", type=int, default=5)
    p.add_argument("--val_freq", type=int, default=5)
    p.add_argument("--print_freq", type=int, default=10)
    p.add_argument("--ap_iou_thresholds", type=float, nargs="+",
                   default=[0.25, 0.5])
    # run mode
    p.add_argument("--eval", action="store_true")
    p.add_argument("--eval_train", action="store_true",
                   help="evaluate on the train split (implies --eval, main_utils.py:115,122)")
    p.add_argument("--reduce_lr", action="store_true",
                   help="resume params but not optimizer state, restarting the LR schedule (main_utils.py:117,136)")
    p.add_argument("--num_workers", type=int, default=4,
                   help="host batch-assembly threads (reference DataLoader workers)")
    p.add_argument("--debug", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max_steps", type=int, default=None, help="cap steps (smoke runs)")
    p.add_argument("--steps_per_epoch", type=int, default=None)
    p.add_argument("--profile", type=int, default=0,
                   help="trace N train steps with jax.profiler into LOG_DIR/profile")
    p.add_argument("--cpu", action="store_true", help="force host CPU backend")
    p.add_argument("--wo_obj_name", default=None,
                   help="alternative ScanRefer annotations without object names (eval variant)")
    args = p.parse_args(argv)
    args.eval = args.eval or args.eval_train  # main_utils.py:122
    if args.sampling != "kps":
        p.error(f"--sampling {args.sampling}: only 'kps' is implemented")
    if args.optimizer.lower() != "adamw":
        p.error(f"--optimizer {args.optimizer}: only adamW is implemented")
    if args.bn_momentum != 0.1:
        p.error("--bn_momentum: only the reference default 0.1 is implemented")
    return args


def build_configs(args):
    from eda_tpu.config import DataConfig, ModelConfig, TrainConfig

    model = ModelConfig(
        num_queries=args.num_queries,
        num_decoder_layers=args.num_decoder_layers,
        num_encoder_layers=args.num_encoder_layers,
        self_position_embedding=args.self_position_embedding,
        self_attend=args.self_attend,
        contrastive_align=args.use_contrastive_align,
        butd=args.butd,
        num_points=args.num_points,
        sa_impl=args.sa_impl,
        use_bf16=args.use_bf16,
        # per-point channels beyond xyz: RGB + height + 128-d multiview
        # (reference num_input_channel, train_dist_mod.py:92-96)
        input_feature_dim=(
            3 * int(args.use_color)
            + int(args.use_height)
            + 128 * int(args.use_multiview)
        ),
    )
    if args.debug and args.dataset == ["synthetic"]:
        model = model.tiny()
    train = TrainConfig(
        batch_size=args.batch_size,
        lr=args.lr,
        lr_backbone=args.lr_backbone,
        text_lr=args.text_encoder_lr,
        weight_decay=args.weight_decay,
        max_epoch=args.max_epoch,
        lr_decay_epochs=tuple(args.lr_decay_epochs),
        lr_decay_rate=args.lr_decay_rate,
        lr_scheduler=args.lr_scheduler,
        warmup_epoch=args.warmup_epoch,
        warmup_multiplier=args.warmup_multiplier,
        clip_norm=args.clip_norm,
        save_freq=args.save_freq,
        val_freq=args.val_freq,
        seed=args.seed,
        checkpoint_dir=args.log_dir,
    )
    data = DataConfig(
        datasets=tuple(args.dataset),
        test_dataset=args.test_dataset or args.dataset[0],
        data_root=args.data_root,
        use_color=args.use_color,
        use_height=args.use_height,
        use_multiview=args.use_multiview,
        augment=args.augment,
        augment_det=args.augment_det,
        detect_intermediate=args.detect_intermediate,
        joint_det=args.joint_det,
        butd=args.butd,
        butd_gt=args.butd_gt,
        butd_cls=args.butd_cls,
        debug=args.debug,
    )
    return model, train, data


def prefetch_batches(gen, index_chunks, butd, num_workers):
    """Assemble batches on background threads (the reference's DataLoader
    ``num_workers`` CPU processes, ``main_utils.py:229-236``). Dataset batch
    assembly is pure numpy keyed only by the indices, so a thread pool with a
    bounded in-flight queue reproduces the pipeline overlap."""
    if num_workers <= 0:
        for idx in index_chunks:
            yield gen.batch(idx, butd=butd)
        return
    import collections
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(num_workers) as pool:
        pending = collections.deque()
        it = iter(index_chunks)
        for _ in range(num_workers * 2):
            try:
                pending.append(pool.submit(gen.batch, next(it), butd=butd))
            except StopIteration:
                break
        while pending:
            batch = pending.popleft().result()
            try:
                pending.append(pool.submit(gen.batch, next(it), butd=butd))
            except StopIteration:
                pass
            yield batch


def make_loader(args, model_cfg, split: str, for_eval: bool = False):
    """Dataset factory. Synthetic works everywhere; ScanNet datasets need
    packed scans + annotation files under --data_root.

    ``for_eval`` suppresses the --joint_det detection-prompt mixing even on
    the train split (the reference's test loader never mixes,
    ``train_dist_mod.py:72-75``) — needed for --eval_train.
    """
    from eda_tpu.data.synthetic import SyntheticConfig, SyntheticScenes

    if args.dataset == ["synthetic"]:
        gen = SyntheticScenes(
            SyntheticConfig(
                num_points=model_cfg.num_points,
                num_objects=8,
                text_len=64,
                max_objects=model_cfg.max_detected_boxes,
                seed=0 if split == "train" else 1,
            ),
            vocab_size=model_cfg.text_vocab_size,
        )
        n = 128 if args.debug else 4096
        return gen, n
    from eda_tpu.data.dataset import GroundingDataset  # real-data path

    ds = GroundingDataset.from_args(args, split)
    if args.joint_det and split == "train" and not for_eval:
        # mix in scannet detection prompts at 10x (train_dist_mod.py:50-51)
        from eda_tpu.data.detection_prompt import (
            DetectionPromptDataset,
            MixedDataset,
        )

        det = DetectionPromptDataset(
            ds.scans, split=split, use_color=args.use_color,
            augment=getattr(args, "augment", True),
            tokenizer=ds.tokenizer,  # shared vocab with the grounding data
            use_height=getattr(args, "use_height", False),
            multiview_path=ds.multiview_path,
            # scannet prompt items ride the same detected-box stream as the
            # grounding items (joint_det_dataset.py:948-963)
            detected_dir=ds.detected_dir,
            augment_det=getattr(args, "augment_det", False),
            butd_gt=args.butd_gt,
            butd_cls=args.butd_cls,
        )
        ds = MixedDataset([ds, det], multipliers=[1, 10])
    return ds, len(ds)


def main(argv=None):
    args = parse_args(argv)
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    # multi-host: one jax.distributed.initialize() replaces the reference's
    # NCCL process-group bootstrap (train_dist_mod.py:337-339)
    if os.environ.get("EDA_TPU_MULTIHOST"):
        jax.distributed.initialize()
    import jax.numpy as jnp

    from eda_tpu.losses.criterion import SetCriterionConfig
    from eda_tpu.models import EDAGrounder
    from eda_tpu.parallel import (
        make_global_batch, make_mesh, process_batch_rows,
    )
    from eda_tpu.train import TrainState, make_optimizer, make_train_step
    from eda_tpu.train.checkpoint import CheckpointManager
    from eda_tpu.utils.logger import setup_logger
    from eda_tpu.utils.metrics import MetricWriter

    model_cfg, train_cfg, data_cfg = build_configs(args)
    os.makedirs(args.log_dir, exist_ok=True)
    logger = setup_logger(args.log_dir)
    logger.info("devices: %s", jax.devices())
    with open(os.path.join(args.log_dir, "config.json"), "w") as f:
        json.dump(
            {k: v for k, v in vars(args).items()}, f, indent=2, default=str
        )

    if args.eval:
        # eval-only never builds the train pipeline (main_utils.py:226-227)
        eval_split = "train" if args.eval_train else "val"
        gen, n_train = make_loader(args, model_cfg, eval_split, for_eval=True)
        _EVAL_CACHE[("loader", eval_split)] = (gen, n_train)
    else:
        gen, n_train = make_loader(args, model_cfg, "train")
    mesh = make_mesh()
    n_dev = mesh.shape["data"]
    global_batch = max(args.batch_size, n_dev)
    global_batch -= global_batch % n_dev
    steps_per_epoch = args.steps_per_epoch or max(n_train // global_batch, 1)

    model = EDAGrounder(model_cfg)
    sample = jax.tree_util.tree_map(
        jnp.asarray, gen.batch(range(global_batch), butd=model_cfg.butd)
    )
    variables = jax.jit(
        lambda: model.init(jax.random.key(train_cfg.seed), sample["inputs"], train=False)
    )()
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    logger.info("params: %.1fM", n_params / 1e6)

    # external pretrained inputs: GroupFree backbone, RoBERTa weights, butd
    # class-embedding table (ref bdetr.py:63-95)
    from eda_tpu.train.convert import load_eda_pth, warm_start

    params0, stats0 = warm_start(
        variables["params"],
        variables["batch_stats"],
        model_cfg,
        pp_checkpoint=args.pp_checkpoint,
        data_root=args.data_root,
        log=logger.info,
    )
    # place parameters on the mesh explicitly (replicated at model=1; the TP
    # specs shard attention/FFN weights at model>1) so train AND eval steps
    # see committed shardings rather than device-0 defaults
    from eda_tpu.parallel import replicate_sharding, shard_params

    params0 = shard_params(params0, mesh)
    stats0 = jax.device_put(stats0, replicate_sharding(mesh))
    variables = {"params": params0, "batch_stats": stats0}

    crit = SetCriterionConfig(
        num_decoder_layers=model_cfg.num_decoder_layers,
        query_points_obj_topk=args.query_points_obj_topk,
        dataset=args.dataset[0] if args.dataset[0] != "synthetic" else "scanrefer",
        use_contrastive_align=model_cfg.contrastive_align,
        # reproduce DDP's per-replica gradient averaging so the published
        # multi-GPU recipes' loss balance transfers to any mesh width
        num_replicas=n_dev,
    )
    tx = make_optimizer(train_cfg, variables["params"], steps_per_epoch)
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)

    ckpt = CheckpointManager(
        os.path.join(args.log_dir, "ckpt"), save_freq=args.save_freq
    )
    restore_opt = not (args.eval or args.reduce_lr)  # main_utils.py:136
    if args.checkpoint_path and args.checkpoint_path.endswith((".pth", ".pt")):
        # released reference checkpoint: accuracy-parity protocol
        params, stats, start_epoch = load_eda_pth(
            args.checkpoint_path, state.params, state.batch_stats, model_cfg,
            log=logger.info,
        )
        state = state.replace(params=params, batch_stats=stats)
    elif args.checkpoint_path:
        mgr = CheckpointManager(args.checkpoint_path, save_freq=args.save_freq)
        state, start_epoch = mgr.restore(state, restore_optimizer=restore_opt)
    else:
        state, start_epoch = ckpt.restore(state, restore_optimizer=restore_opt)
    if start_epoch:
        logger.info("resumed from epoch %d", start_epoch)

    writer = MetricWriter(args.log_dir)

    # eval-only: evaluate the full test split and end execution
    # (main_utils.py:356-362, driven by scripts/test_*.sh)
    if args.eval:
        logger.info("Testing evaluation (eval-only mode)...")
        evaluate(args, model, crit, state, model_cfg, logger,
                 writer=writer, step=int(state.step), mesh=mesh)
        writer.close()
        return 0

    step_fn = make_train_step(model, crit, donate=False)
    rng = jax.random.key(train_cfg.seed)
    # Every process derives the SAME epoch permutation from the shared seed
    # (the reference's DistributedSampler.set_epoch contract,
    # main_utils.py:229-242,368) and assembles ONLY the rows whose target
    # devices it hosts — host-side augmentation/positive-map work scales
    # 1/P with process count instead of duplicating the pod batch per host.
    order_rng = np.random.default_rng(train_cfg.seed)
    local_rows = process_batch_rows(mesh, global_batch)

    profile_left = args.profile
    if profile_left:
        jax.profiler.start_trace(os.path.join(args.log_dir, "profile"))

    total_steps = 0
    for epoch in range(start_epoch, args.max_epoch):
        t_ep = time.time()
        order = order_rng.permutation(n_train)
        chunks = []
        for it in range(steps_per_epoch):
            idx = order[(it * global_batch) % n_train:][:global_batch]
            if len(idx) < global_batch:
                idx = np.concatenate([idx, order[: global_batch - len(idx)]])
            chunks.append(idx)
        losses = []
        local_chunks = [c[local_rows] for c in chunks]
        for it, batch_np in enumerate(
            prefetch_batches(gen, local_chunks, model_cfg.butd, args.num_workers)
        ):
            batch = make_global_batch(batch_np, mesh, global_batch)
            state, metrics = step_fn(state, batch, rng)
            total_steps += 1
            if profile_left:
                jax.block_until_ready(metrics["loss"])
                profile_left -= 1
                if profile_left == 0:
                    jax.profiler.stop_trace()
                    logger.info(
                        "profile trace written to %s",
                        os.path.join(args.log_dir, "profile"),
                    )
            if it % args.print_freq == 0:
                loss = float(metrics["loss"])
                losses.append(loss)
                logger.info(
                    "epoch %d step %d/%d loss %.4f (kps %.3f ce %.3f bbox %.3f giou %.3f sem %.3f)",
                    epoch, it, steps_per_epoch, loss,
                    float(metrics["query_points_generation_loss"]),
                    float(metrics["loss_ce"]), float(metrics["loss_bbox"]),
                    float(metrics["loss_giou"]), float(metrics["loss_sem_align"]),
                )
                # train_loss scalar group (record_tensorboard.py:33-52)
                writer.write(
                    total_steps,
                    {
                        k: float(metrics[k])
                        for k in (
                            "loss", "loss_ce", "loss_bbox", "loss_giou",
                            "loss_sem_align", "query_points_generation_loss",
                            "grad_norm",
                        )
                        if k in metrics
                    },
                    group="train",
                )
            if args.max_steps and total_steps >= args.max_steps:
                logger.info("max_steps reached")
                ckpt.save(epoch, state, force=True)
                writer.close()
                return 0
        logger.info(
            "epoch %d done in %.1fs (mean loss %.4f)",
            epoch, time.time() - t_ep, np.mean(losses) if losses else float("nan"),
        )
        ckpt.save(epoch, state)

        if (epoch + 1) % args.val_freq == 0 or epoch == args.max_epoch - 1:
            evaluate(args, model, crit, state, model_cfg, logger,
                     writer=writer, step=total_steps, mesh=mesh)

    ckpt.save(args.max_epoch - 1, state, force=True)
    writer.close()
    return 0


_EVAL_CACHE = {}


def tail_chunks(n: int, bsz: int):
    """Fixed-size index chunks covering [0, n) with a padded+masked tail.

    Returns a list of (idx (bsz,), valid (bsz,) bool); padding rows reuse
    index 0 and are masked False. Both eval paths use this so no split ever
    silently drops its tail (reference scores every val scan,
    ``train_dist_mod.py:202-327``).
    """
    chunks = []
    for start in range(0, n, bsz):
        idx = np.arange(start, min(start + bsz, n))
        valid = np.ones(bsz, bool)
        if len(idx) < bsz:
            valid[len(idx):] = False
            idx = np.concatenate([idx, np.zeros(bsz - len(idx), np.int64)])
        chunks.append((idx, valid))
    return chunks


def evaluate(
    args, model, crit, state, model_cfg, logger, writer=None, step=0, mesh=None
):
    """Full-split grounding evaluation (reference evaluate_one_epoch,
    train_dist_mod.py:129-199 + main_utils.py:529-565).

    The whole test split is scored: the tail batch is padded up to the jit
    batch size and the padding rows are masked out of the counters. With a
    ``mesh``, each eval batch is sharded over the 'data' axis so the forward
    runs SPMD like the train step (the reference evaluates under DDP too,
    main_utils.py:529-565).
    """
    import jax
    import jax.numpy as jnp

    from eda_tpu.eval import GroundingEvaluator
    from eda_tpu.parallel import shard_batch, to_host_global
    from eda_tpu.train import make_eval_score_step

    if args.test_dataset == "scannet":
        return evaluate_detection(args, model, state, model_cfg, logger, mesh)

    split = "train" if args.eval_train else "val"
    cache_key = ("loader", split)
    if cache_key not in _EVAL_CACHE:
        _EVAL_CACHE[cache_key] = make_loader(args, model_cfg, split, for_eval=True)
    evaluator = GroundingEvaluator(
        prefixes=("last_", "proposal_"),
        # SR3D/NR3D protocol: predictions must overlap a detected box
        # (train_dist_mod.py:157-161 passes args.butd_cls)
        filter_non_gt_boxes=args.butd_cls,
    )
    score_key = ("eval_score_fn", args.butd_cls)
    if score_key not in _EVAL_CACHE:
        # forward + all prefix/mode scoring fused into one dispatch; the
        # evaluator only consumes the (P, M, B, 10) IoU stack
        _EVAL_CACHE[score_key] = make_eval_score_step(
            model,
            prefixes=evaluator.prefixes,
            modes=evaluator.modes,
            filter_non_gt_boxes=args.butd_cls,
        )
    gen, n_val = _EVAL_CACHE[cache_key]
    score_fn = _EVAL_CACHE[score_key]
    bsz = max(args.batch_size, 1)
    if mesh is not None:  # batch must divide over the data axis
        n_dev = mesh.shape["data"]
        bsz = max(bsz, n_dev)
        bsz -= bsz % n_dev
    pairs = tail_chunks(n_val, bsz)
    chunks = [idx for idx, _ in pairs]
    valids = [valid for _, valid in pairs]
    # one-deep pipeline: dispatch batch i+1 BEFORE fetching batch i's IoU
    # stack, so the per-batch device->host round-trip (~35 ms through a
    # tunneled backend) overlaps the next batch's on-device compute instead
    # of serializing with it (jax dispatch is async; to_host_global blocks
    # only the host)
    pending = None
    for batch_np, valid in zip(
        prefetch_batches(gen, chunks, model_cfg.butd, args.num_workers), valids
    ):
        hardness = batch_np.pop("hardness", None)
        batch = jax.tree_util.tree_map(jnp.asarray, batch_np)
        if mesh is not None:
            # eval assembles the GLOBAL batch on every host (unlike the
            # train loop's process_batch_rows slicing): the counters run
            # replicated over to_host_global'd results, so each host needs
            # the full batch's hardness flags; eval is a rare epoch-end
            # pass, so duplicated host work is bounded
            batch = shard_batch(batch, mesh)
        ious_dev = score_fn(state.params, state.batch_stats, batch)
        if pending is not None:
            p_ious, p_hard, p_valid = pending
            evaluator.evaluate(
                None, None, p_hard, valid=p_valid, ious=to_host_global(p_ious)
            )
        pending = (ious_dev, hardness, valid)
    if pending is not None:
        p_ious, p_hard, p_valid = pending
        evaluator.evaluate(
            None, None, p_hard, valid=p_valid, ious=to_host_global(p_ious)
        )
    logger.info("\n%s", evaluator.print_stats())
    if writer is not None:
        writer.write(
            step,
            {
                f"{prefix}Acc{t}Top{k}_{mode}": evaluator.accuracy(prefix, t, k, mode)
                for prefix in ("last_",)
                for t in (0.25, 0.5)
                for k in (1, 5, 10)
                for mode in ("bbs", "bbf")
            },
            group="val",
        )
    return evaluator


def evaluate_detection(args, model, state, model_cfg, logger, mesh=None):
    """ScanNet detection AP over the fixed 18-class prompt
    (``train_dist_mod.py:202-327`` equivalent)."""
    import jax
    import jax.numpy as jnp

    from eda_tpu.parallel import shard_batch

    from eda_tpu.data.class_config import (
        NYU40_IDS_18,
        instance_label_to_class18,
        raw_to_nyu40,
    )
    from eda_tpu.data.dataset import MAX_NUM_OBJ
    from eda_tpu.data.detection_prompt import DetectionPromptDataset
    from eda_tpu.data.scannet import load_packed_scans
    from eda_tpu.eval.det_branch import evaluate_detection_batch
    from eda_tpu.eval.detection import APCalculator
    from eda_tpu.train import make_eval_step

    scans = load_packed_scans(os.path.join(args.data_root, "val_v3scans.pkl"))
    ds = DetectionPromptDataset(
        scans, split="val", use_color=args.use_color, augment=False,
        use_height=getattr(args, "use_height", False),
        multiview_path=(
            os.path.join(
                args.data_root, "scanrefer_2d_feats", "enet_feats_maxpool.hdf5"
            )
            if getattr(args, "use_multiview", False)
            else None
        ),
        detected_dir=os.path.join(args.data_root, "group_free_pred_bboxes"),
        butd_gt=args.butd_gt,
        butd_cls=args.butd_cls,
    )
    eval_fn = make_eval_step(model)
    # one calculator per threshold (reference ap_calculator_list,
    # train_dist_mod.py:234-241)
    thresholds = list(getattr(args, "ap_iou_thresholds", [0.25, 0.5]))
    calcs = [APCalculator(iou_thresh=t) for t in thresholds]
    bsz = max(args.batch_size, 1)
    if mesh is not None:
        n_dev = mesh.shape["data"]
        bsz = max(bsz, n_dev)
        bsz -= bsz % n_dev
    # the eval prompt is FIXED (18 class names); tokenize once, not per batch
    from eda_tpu.data.detection_prompt import PROMPT_NAMES

    caption = " . ".join(PROMPT_NAMES) + " . not mentioned"
    tok = ds.tokenizer.encode_batch([caption], max_len=ds.text_len)
    # full split, pad+mask the tail batch exactly like the grounding path
    # (the reference scores every val scan, train_dist_mod.py:202-327)
    for idx, valid in tail_chunks(len(ds), bsz):
        batch_np = ds.batch(idx, butd=model_cfg.butd)
        batch = jax.tree_util.tree_map(jnp.asarray, batch_np)
        if mesh is not None:
            batch = shard_batch(batch, mesh)
        end_points, _ = eval_fn(state.params, state.batch_stats, batch)
        # recover per-sample gt classes from the scans; ds.batch(idx) row i
        # is scan ds.scan_ids[idx[i]] (pinned by test_det_eval_scan_mapping)
        gt_classes = np.zeros((bsz, MAX_NUM_OBJ), np.int64)
        nyu18 = set(NYU40_IDS_18)
        for i in range(bsz):
            scan = ds.scans[ds.scan_ids[int(idx[i]) % len(ds.scan_ids)]]
            # STRICT 18-class membership, matching the dataset's fixed-prompt
            # target selection (joint_det_dataset.py:876-881) — the else-17
            # fallback would admit walls/floors as 'other furniture' GT
            keep = [
                instance_label_to_class18(o["instance_label"])
                for o in scan.three_d_objects
                if raw_to_nyu40().get(o["instance_label"]) in nyu18
            ][:MAX_NUM_OBJ]
            gt_classes[i, : len(keep)] = keep
        evaluate_detection_batch(
            calcs, end_points, batch_np["targets"], gt_classes, tok, caption,
            valid=valid,
        )
    out = {}
    for t, calc in zip(thresholds, calcs):
        metrics = calc.compute_metrics()
        logger.info("detection mAP@%.2f: %.4f", t, metrics["mAP"])
        out[f"mAP@{t}"] = metrics["mAP"]
        if "mAP" not in out or t > 0.3:  # headline like the reference (:314)
            out["mAP"] = metrics["mAP"]
    return out


if __name__ == "__main__":
    sys.exit(main())
