"""Reference ``.pth`` -> EDAGrounder Flax tree converters.

The reference trains torch modules whose state dicts must map onto this
repo's Flax param/batch_stats trees for two warm-start paths:

* ``--pp_checkpoint`` — GroupFree PointNet++ backbone warm-start
  (``models/bdetr.py:67-70`` loads ``gf_detector_l6o256.pth`` strict=False);
* ``--checkpoint_path foo.pth`` — a released EDA checkpoint for the
  accuracy-parity protocol (``main_utils.py:126-145``).

Every helper below maps one torch module family onto the corresponding Flax
module's auto-named subtree:

    torch nn.Linear(in,out).weight (out,in)      -> Dense kernel (in,out)
    torch nn.Conv1d(in,out,1).weight (out,in,1)  -> Dense kernel (in,out)
    torch nn.Conv2d(in,out,1,1) [SharedMLP]      -> Dense kernel (in,out)
    torch nn.BatchNorm*d                         -> BatchNorm {scale,bias} +
                                                    batch_stats {mean,var}
    torch nn.MultiheadAttention in_proj/out_proj -> MultiHeadDotProductAttention
        {query,key,value} kernels (d, heads, head_dim), out (heads, head_dim, d)
    torch nn.LayerNorm                           -> LayerNorm {scale,bias}

Conversion is strict=False like the reference loader: only keys present in
the state dict are emitted; ``merge_into`` overlays them onto an initialized
tree and reports how many leaves loaded.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from eda_tpu.config import ModelConfig
from eda_tpu.models.roberta import convert_hf_state_dict


def _t(sd, key):
    return np.asarray(sd[key])


def _linear(sd, key):
    out = {"kernel": _t(sd, key + ".weight").T}
    if key + ".bias" in sd:
        out["bias"] = _t(sd, key + ".bias")
    return out


def _conv1x1(sd, key):
    """Conv1d/Conv2d with kernel size 1 -> Dense."""
    w = _t(sd, key + ".weight")
    w = w.reshape(w.shape[0], w.shape[1])  # (out, in, 1[, 1]) -> (out, in)
    out = {"kernel": w.T}
    if key + ".bias" in sd:
        out["bias"] = _t(sd, key + ".bias")
    return out


def _ln(sd, key):
    return {"scale": _t(sd, key + ".weight"), "bias": _t(sd, key + ".bias")}


def _bn(sd, key):
    params = {"scale": _t(sd, key + ".weight"), "bias": _t(sd, key + ".bias")}
    stats = {
        "mean": _t(sd, key + ".running_mean"),
        "var": _t(sd, key + ".running_var"),
    }
    return params, stats


def _mha(sd, key, heads):
    """torch nn.MultiheadAttention -> flax MultiHeadDotProductAttention."""
    w = _t(sd, key + ".in_proj_weight")  # (3d, d)
    b = _t(sd, key + ".in_proj_bias")  # (3d,)
    d = w.shape[1]
    hd = d // heads

    def proj(i):
        return {
            "kernel": w[i * d:(i + 1) * d].T.reshape(d, heads, hd),
            "bias": b[i * d:(i + 1) * d].reshape(heads, hd),
        }

    out_w = _t(sd, key + ".out_proj.weight").T  # (d, d)
    return {
        "query": proj(0),
        "key": proj(1),
        "value": proj(2),
        "out": {
            "kernel": out_w.reshape(heads, hd, d),
            "bias": _t(sd, key + ".out_proj.bias"),
        },
    }


def _residual_attn(sd, attn_key, norm_key, heads):
    """models/layers.py ResidualAttn subtree (MHA + post-LayerNorm)."""
    return {
        "MHA_0": {"MultiHeadDotProductAttention_0": _mha(sd, attn_key, heads)},
        "LayerNorm_0": _ln(sd, norm_key),
    }


def _ffn(sd, ffn_key, norm_key):
    """models/layers.py FFN subtree (Linear-ReLU-Linear + post-LayerNorm);
    reference nn.Sequential indices 0/3 hold the Linears."""
    return {
        "Dense_0": _linear(sd, ffn_key + ".0"),
        "Dense_1": _linear(sd, ffn_key + ".3"),
        "LayerNorm_0": _ln(sd, norm_key),
    }


def _pos_embed(sd, key):
    """PositionEmbeddingLearned: Conv1d+BN1d+ReLU+Conv1d
    (``models/modules.py:52-67``, Sequential indices 0/1/3)."""
    head = key + ".position_embedding_head"
    bn_p, bn_s = _bn(sd, head + ".1")
    params = {
        "Dense_0": _conv1x1(sd, head + ".0"),
        "BatchNorm_0": bn_p,
        "Dense_1": _conv1x1(sd, head + ".3"),
    }
    return params, {"BatchNorm_0": bn_s}


def _three_mlp(sd, key):
    """ThreeLayerMLP: Sequential conv/bn/relu/drop x2 + conv
    (``models/modules.py:89-108``, indices 0/1/4/5/8)."""
    bn0_p, bn0_s = _bn(sd, key + ".net.1")
    bn1_p, bn1_s = _bn(sd, key + ".net.5")
    params = {
        "Dense_0": _conv1x1(sd, key + ".net.0"),
        "BatchNorm_0": bn0_p,
        "Dense_1": _conv1x1(sd, key + ".net.4"),
        "BatchNorm_1": bn1_p,
        "Dense_2": _conv1x1(sd, key + ".net.8"),
    }
    return params, {"BatchNorm_0": bn0_s, "BatchNorm_1": bn1_s}


def _predict_head(sd, key):
    """ClsAgnosticPredictHead (``models/modules.py:111-178``)."""
    params, stats = {}, {}
    for ours, theirs in (
        ("center_head", "center_residual_head"),
        ("size_head", "size_pred_head"),
        ("sem_cls_head", "sem_cls_scores_head"),
    ):
        p, s = _three_mlp(sd, f"{key}.{theirs}")
        params[ours] = p
        stats[ours] = s
    return params, stats


def _shared_mlp(sd, key, num_layers):
    """pytorch_utils.SharedMLP: layer{i}.conv (no bias) + layer{i}.bn.bn."""
    params, stats = {}, {}
    for i in range(num_layers):
        params[f"Dense_{i}"] = _conv1x1(sd, f"{key}.layer{i}.conv")
        bn_p, bn_s = _bn(sd, f"{key}.layer{i}.bn.bn")
        params[f"BatchNorm_{i}"] = bn_p
        stats[f"BatchNorm_{i}"] = bn_s
    return params, stats


def _strip_prefixes(sd: dict) -> dict:
    """Drop DDP 'module.' wrappers; keep everything else verbatim."""
    out = {}
    for key, value in sd.items():
        while key.startswith("module."):
            key = key[len("module."):]
        out[key] = value
    return out


def convert_backbone(
    sd: dict, cfg: ModelConfig
) -> Tuple[dict, dict]:
    """Pointnet2Backbone state dict -> backbone_net Flax subtrees.

    Accepts either bare keys (``sa1.mlp_module...``) or keys under a
    ``backbone_net.`` prefix (full-detector checkpoints like GroupFree's
    ``gf_detector_l6o256.pth``). Exact for the gather path
    (``SetAbstraction``/``FeaturePropagation``); on the fused path only the
    conv kernels transfer (as ``w{i}``) — the fused layer normalizes with
    LayerNorm, so BN statistics have no counterpart and the warm start is
    initialization-level only (the reference itself loads strict=False,
    ``models/bdetr.py:67-70``).
    """
    sd = _strip_prefixes(sd)
    if not any(k.startswith("sa1.") for k in sd):
        sd = {
            k[len("backbone_net."):]: v
            for k, v in sd.items()
            if k.startswith("backbone_net.")
        }
    params: Dict = {}
    stats: Dict = {}
    for i in range(4):
        name = f"sa{i + 1}"
        if f"{name}.mlp_module.layer0.conv.weight" not in sd:
            continue
        n_layers = len(cfg.sa_mlps[i])
        if cfg.sa_impl == "gather":
            p, s = _shared_mlp(sd, f"{name}.mlp_module", n_layers)
            params[name] = {"SharedMLP_0": p}
            stats[name] = {"SharedMLP_0": s}
        else:  # fused: kernels only, see docstring
            p = {}
            for j in range(n_layers):
                p[f"w{j}"] = _conv1x1(sd, f"{name}.mlp_module.layer{j}.conv")[
                    "kernel"
                ]
            params[name] = p
    for i in range(2):
        name = f"fp{i + 1}"
        if f"{name}.mlp.layer0.conv.weight" not in sd:
            continue
        p, s = _shared_mlp(sd, f"{name}.mlp", len(cfg.fp_mlps[i]))
        params[name] = {"SharedMLP_0": p}
        stats[name] = {"SharedMLP_0": s}
    return params, stats


def convert_eda_checkpoint(
    sd: dict, cfg: ModelConfig
) -> Tuple[dict, dict]:
    """Full BeaUTyDETR state dict -> (params, batch_stats) for EDAGrounder.

    Covers every torch module of ``models/bdetr.py:46-157``; missing keys are
    skipped (strict=False), so partial checkpoints produce partial trees.
    """
    sd = _strip_prefixes(sd)
    params: Dict = {}
    stats: Dict = {}

    bp, bs = convert_backbone(sd, cfg)
    if bp:
        params["backbone_net"] = bp
        if bs:
            stats["backbone_net"] = bs

    # frozen RoBERTa (HF names under text_encoder.)
    text_sd = {
        k[len("text_encoder."):]: v
        for k, v in sd.items()
        if k.startswith("text_encoder.")
    }
    if text_sd:
        params["text_encoder"] = convert_hf_state_dict(
            text_sd, cfg.text_layers, cfg.text_heads
        )

    if "text_projector.0.weight" in sd:
        params["text_projector_dense"] = _linear(sd, "text_projector.0")
        params["text_projector_norm"] = _ln(sd, "text_projector.1")

    # butd box stream (bdetr.py:88-97)
    if "butd_class_embeddings.weight" in sd:
        params["butd_class_embeddings"] = {
            "embedding": _t(sd, "butd_class_embeddings.weight")
        }
    if "class_embeddings.weight" in sd:
        params["class_embeddings"] = _linear(sd, "class_embeddings")
    if "box_embeddings.position_embedding_head.0.weight" in sd:
        p, s = _pos_embed(sd, "box_embeddings")
        params["box_embeddings"] = p
        stats["box_embeddings"] = s

    if "pos_embed.position_embedding_head.0.weight" in sd:
        p, s = _pos_embed(sd, "pos_embed")
        params["pos_embed"] = p
        stats["pos_embed"] = s

    heads = cfg.n_heads
    for i in range(cfg.num_encoder_layers):
        key = f"cross_encoder.layers.{i}"
        if f"{key}.cross_layer.cross_lv.in_proj_weight" not in sd:
            continue
        layer = {
            "cross_lv": _residual_attn(
                sd, f"{key}.cross_layer.cross_lv", f"{key}.cross_layer.norm_lv", heads
            ),
            "ffn_lv": _ffn(
                sd, f"{key}.cross_layer.ffn_lv", f"{key}.cross_layer.norm_lv2"
            ),
            "cross_vl": _residual_attn(
                sd, f"{key}.cross_layer.cross_vl", f"{key}.cross_layer.norm_vl", heads
            ),
            "ffn_vl": _ffn(
                sd, f"{key}.cross_layer.ffn_vl", f"{key}.cross_layer.norm_vl2"
            ),
        }
        if f"{key}.self_attention_visual.self_attn.in_proj_weight" in sd:
            layer["self_vis"] = _residual_attn(
                sd,
                f"{key}.self_attention_visual.self_attn",
                f"{key}.self_attention_visual.norm1",
                heads,
            )
            layer["self_lang"] = _residual_attn(
                sd,
                f"{key}.self_attention_lang.self_attn",
                f"{key}.self_attention_lang.norm1",
                heads,
            )
        if f"{key}.cross_layer.cross_d.in_proj_weight" in sd:
            layer["cross_d"] = _residual_attn(
                sd, f"{key}.cross_layer.cross_d", f"{key}.cross_layer.norm_d", heads
            )
        params[f"cross_encoder_{i}"] = layer

    if "points_obj_cls.conv1.weight" in sd:
        bn1_p, bn1_s = _bn(sd, "points_obj_cls.bn1")
        bn2_p, bn2_s = _bn(sd, "points_obj_cls.bn2")
        params["points_obj_cls"] = {
            "Dense_0": _conv1x1(sd, "points_obj_cls.conv1"),
            "BatchNorm_0": bn1_p,
            "Dense_1": _conv1x1(sd, "points_obj_cls.conv2"),
            "BatchNorm_1": bn2_p,
            "Dense_2": _conv1x1(sd, "points_obj_cls.conv3"),
        }
        stats["points_obj_cls"] = {"BatchNorm_0": bn1_s, "BatchNorm_1": bn2_s}

    if "decoder_query_proj.weight" in sd:
        params["decoder_query_proj"] = _conv1x1(sd, "decoder_query_proj")

    if "proposal_head.center_residual_head.net.0.weight" in sd:
        p, s = _predict_head(sd, "proposal_head")
        params["proposal_head"] = p
        stats["proposal_head"] = s

    for i in range(cfg.num_decoder_layers):
        key = f"decoder.{i}"
        if f"{key}.self_attn.in_proj_weight" not in sd:
            continue
        layer = {
            "self_attn": _residual_attn(
                sd, f"{key}.self_attn", f"{key}.norm1", heads
            ),
            "cross_l": _residual_attn(sd, f"{key}.cross_l", f"{key}.norm_l", heads),
            "cross_v": _residual_attn(sd, f"{key}.cross_v", f"{key}.norm_v", heads),
            "ffn": _ffn(sd, f"{key}.ffn", f"{key}.norm2"),
        }
        layer_stats = {}
        if f"{key}.self_posembed.position_embedding_head.0.weight" in sd:
            p, s = _pos_embed(sd, f"{key}.self_posembed")
            layer["self_posembed"] = p
            layer_stats["self_posembed"] = s
        if f"{key}.cross_d.in_proj_weight" in sd:
            layer["cross_d"] = _residual_attn(
                sd, f"{key}.cross_d", f"{key}.norm_d", heads
            )
        params[f"decoder_{i}"] = layer
        if layer_stats:
            stats[f"decoder_{i}"] = layer_stats

        hkey = f"prediction_heads.{i}"
        if f"{hkey}.center_residual_head.net.0.weight" in sd:
            p, s = _predict_head(sd, hkey)
            params[f"prediction_head_{i}"] = p
            stats[f"prediction_head_{i}"] = s

    for ours, theirs in (
        ("contrastive_proj_image", "contrastive_align_projection_image"),
        ("contrastive_proj_text", "contrastive_align_projection_text"),
    ):
        if f"{theirs}.0.weight" in sd:
            params[ours] = {
                "Dense_0": _linear(sd, f"{theirs}.0"),
                "Dense_1": _linear(sd, f"{theirs}.2"),
                "Dense_2": _linear(sd, f"{theirs}.4"),
            }

    return params, stats


def warm_start(
    params: dict,
    batch_stats: dict,
    cfg: ModelConfig,
    *,
    pp_checkpoint: str = None,
    data_root: str = None,
    log=print,
) -> Tuple[dict, dict]:
    """Apply the reference's external model-init inputs (bdetr.py:63-95):

    1. ``pp_checkpoint`` — GroupFree PointNet++ warm start, strict=False
       (``models/bdetr.py:67-70``);
    2. ``{data_root}/roberta-base`` — frozen HF RoBERTa weights
       (``models/bdetr.py:76-78``), loaded when a torch weights file exists;
    3. ``{data_root}/class_embeddings3d.npy`` — the frozen butd class-name
       embedding table (``models/bdetr.py:90-95``), regenerable with
       ``tools/gen_class_embeddings.py``.

    Returns possibly-updated (params, batch_stats); missing files are
    skipped with a log line, matching the reference's optional behavior.
    """
    import os.path as osp

    from eda_tpu.train.checkpoint import load_torch_checkpoint

    if pp_checkpoint and osp.exists(pp_checkpoint):
        sd = load_torch_checkpoint(pp_checkpoint)
        bb_params, bb_stats = convert_backbone(sd, cfg)
        if bb_params:
            merged, n = merge_into(params["backbone_net"], bb_params)
            params = {**params, "backbone_net": merged}
            if bb_stats and "backbone_net" in batch_stats:
                merged_s, n_s = merge_into(batch_stats["backbone_net"], bb_stats)
                batch_stats = {**batch_stats, "backbone_net": merged_s}
                n += n_s
            log(f"pp_checkpoint: warm-started {n} backbone leaves from {pp_checkpoint}")
    elif pp_checkpoint:
        log(f"pp_checkpoint not found, skipping: {pp_checkpoint}")

    if data_root:
        rb_dir = osp.join(data_root, "roberta-base")
        weights = next(
            (
                osp.join(rb_dir, f)
                for f in ("pytorch_model.bin", "model.pt")
                if osp.exists(osp.join(rb_dir, f))
            ),
            None,
        )
        if weights and "text_encoder" in params:
            sd = load_torch_checkpoint(weights)
            sd = {
                (k[len("roberta."):] if k.startswith("roberta.") else k): v
                for k, v in sd.items()
            }
            text = convert_hf_state_dict(sd, cfg.text_layers, cfg.text_heads)
            merged, n = merge_into(params["text_encoder"], text)
            params = {**params, "text_encoder": merged}
            log(f"text_encoder: loaded {n} RoBERTa leaves from {weights}")

        emb_path = osp.join(data_root, "class_embeddings3d.npy")
        if osp.exists(emb_path) and "butd_class_embeddings" in params:
            table = np.load(emb_path, allow_pickle=True)
            have = params["butd_class_embeddings"]["embedding"]
            if table.shape == have.shape:
                params = {
                    **params,
                    "butd_class_embeddings": {
                        "embedding": np.asarray(table, np.asarray(have).dtype)
                    },
                }
                log(f"butd_class_embeddings: loaded table {table.shape} from {emb_path}")
            else:
                log(
                    f"class_embeddings3d.npy shape {table.shape} != model "
                    f"{have.shape}, skipping"
                )
    return params, batch_stats


def load_eda_pth(
    path: str, params: dict, batch_stats: dict, cfg: ModelConfig, log=print
) -> Tuple[dict, dict, int]:
    """Load a released EDA ``.pth`` checkpoint into (params, batch_stats).

    Returns (params, batch_stats, start_epoch); the epoch comes from the
    checkpoint payload like the reference resume (``main_utils.py:126-135``).
    """
    import torch

    from eda_tpu.train.checkpoint import load_torch_checkpoint

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    try:
        start_epoch = int(ckpt.get("epoch", -1)) + 1
    except Exception:
        start_epoch = 0
    sd = load_torch_checkpoint(path)
    new_params, new_stats = convert_eda_checkpoint(sd, cfg)
    params, n_p = merge_into(params, new_params)
    if new_stats:
        batch_stats, n_s = merge_into(batch_stats, new_stats)
    else:
        n_s = 0
    log(f"loaded EDA .pth: {n_p} param + {n_s} stat leaves from {path}")
    return params, batch_stats, start_epoch


def merge_into(base: dict, loaded: dict, path: str = "") -> Tuple[dict, int]:
    """Overlay ``loaded`` leaves onto ``base`` (strict=False semantics).

    Returns (merged tree, number of array leaves replaced). Shapes must
    match; a mismatch raises with the offending path.
    """
    merged = dict(base)
    count = 0
    for key, value in loaded.items():
        where = f"{path}/{key}"
        if key not in base:
            raise KeyError(f"checkpoint key has no Flax counterpart: {where}")
        if isinstance(value, dict):
            merged[key], sub = merge_into(base[key], value, where)
            count += sub
        else:
            have = np.shape(base[key])
            want = np.shape(value)
            if tuple(have) != tuple(want):
                raise ValueError(f"shape mismatch at {where}: {have} vs {want}")
            merged[key] = np.asarray(value, dtype=np.asarray(base[key]).dtype)
            count += 1
    return merged, count
