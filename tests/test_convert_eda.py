"""Checkpoint-parity converters: reference .pth names -> EDAGrounder tree.

Two layers of evidence:

* structure: a fabricated full BeaUTyDETR state dict (reference names,
  ``models/bdetr.py:46-157``) converts into trees that overlay the tiny
  EDAGrounder init tree COMPLETELY — every param and batch_stats leaf loads
  and no checkpoint key is left without a Flax counterpart;
* numerics: each torch module family (MultiheadAttention residual blocks,
  Conv1d+BN towers, SharedMLP) is instantiated in torch with random weights
  and its eval-mode forward must match the corresponding Flax module run
  with converted weights.
"""

import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from eda_tpu.config import ModelConfig
from eda_tpu.train.convert import (
    _mha,
    _pos_embed,
    _residual_attn,
    _shared_mlp,
    _three_mlp,
    convert_backbone,
    convert_eda_checkpoint,
    merge_into,
)

TINY = dataclasses.replace(
    ModelConfig().tiny(), butd=True, sa_impl="gather", use_bf16=False
)


def _torch_sd(prefix, module):
    return {
        f"{prefix}.{k}": v.detach().numpy() for k, v in module.state_dict().items()
    }


def _mha_torch(d, heads):
    return torch.nn.MultiheadAttention(d, heads, dropout=0.0)


def _ffn_torch(d, dff):
    return torch.nn.Sequential(
        torch.nn.Linear(d, dff),
        torch.nn.ReLU(),
        torch.nn.Dropout(0.0),
        torch.nn.Linear(dff, d),
        torch.nn.Dropout(0.0),
    )


def _pos_embed_torch(in_ch, d):
    class PE(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.position_embedding_head = torch.nn.Sequential(
                torch.nn.Conv1d(in_ch, d, 1),
                torch.nn.BatchNorm1d(d),
                torch.nn.ReLU(),
                torch.nn.Conv1d(d, d, 1),
            )

    return PE()


def _three_mlp_torch(d, out):
    class M(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.net = torch.nn.Sequential(
                torch.nn.Conv1d(d, d, 1, bias=False),
                torch.nn.BatchNorm1d(d),
                torch.nn.ReLU(),
                torch.nn.Dropout(0.3),
                torch.nn.Conv1d(d, d, 1, bias=False),
                torch.nn.BatchNorm1d(d),
                torch.nn.ReLU(),
                torch.nn.Dropout(0.3),
                torch.nn.Conv1d(d, out, 1),
            )

    return M()


def fabricate_eda_state_dict(cfg: ModelConfig) -> dict:
    """Random torch modules with the reference's exact attribute names."""
    torch.manual_seed(0)
    sd = {}
    d = cfg.d_model

    # backbone: 4 SA (SharedMLP under mlp_module) + 2 FP (under mlp);
    # SA input = 3 (relative xyz) + feature channels (backbone_module.py:44-78)
    for i, mlp in enumerate(cfg.sa_mlps):
        in_ch = 3 + (cfg.input_feature_dim if i == 0 else cfg.sa_mlps[i - 1][-1])
        chans = [in_ch, *mlp]
        for j in range(len(mlp)):
            conv = torch.nn.Conv2d(chans[j], chans[j + 1], 1, bias=False)
            bn = torch.nn.BatchNorm2d(chans[j + 1])
            sd.update(_torch_sd(f"backbone_net.sa{i+1}.mlp_module.layer{j}.conv", conv))
            sd.update(_torch_sd(f"backbone_net.sa{i+1}.mlp_module.layer{j}.bn.bn", bn))
    fp_ins = (
        cfg.sa_mlps[2][-1] + cfg.sa_mlps[3][-1],
        cfg.sa_mlps[1][-1] + cfg.fp_mlps[0][-1],
    )
    for i, mlp in enumerate(cfg.fp_mlps):
        chans = [fp_ins[i], *mlp]
        for j in range(len(mlp)):
            conv = torch.nn.Conv2d(chans[j], chans[j + 1], 1, bias=False)
            bn = torch.nn.BatchNorm2d(chans[j + 1])
            sd.update(_torch_sd(f"backbone_net.fp{i+1}.mlp.layer{j}.conv", conv))
            sd.update(_torch_sd(f"backbone_net.fp{i+1}.mlp.layer{j}.bn.bn", bn))

    # text encoder (HF roberta names)
    from tests.test_converters import fabricate_hf_state_dict

    hf = fabricate_hf_state_dict(
        np.random.default_rng(0),
        vocab=cfg.text_vocab_size,
        hidden=cfg.text_hidden,
        layers=cfg.text_layers,
        inter=cfg.text_intermediate,
    )
    sd.update({f"text_encoder.{k}": v for k, v in hf.items()})

    sd.update(_torch_sd("text_projector.0", torch.nn.Linear(cfg.text_hidden, d)))
    sd.update(_torch_sd("text_projector.1", torch.nn.LayerNorm(d)))

    sd.update(
        _torch_sd(
            "butd_class_embeddings",
            torch.nn.Embedding(cfg.num_obj_class, cfg.butd_class_embed_dim),
        )
    )
    sd.update(
        _torch_sd(
            "class_embeddings",
            torch.nn.Linear(cfg.butd_class_embed_dim, d - cfg.butd_box_dim),
        )
    )
    sd.update(_torch_sd("box_embeddings", _pos_embed_torch(6, cfg.butd_box_dim)))
    sd.update(_torch_sd("pos_embed", _pos_embed_torch(3, d)))

    for i in range(cfg.num_encoder_layers):
        key = f"cross_encoder.layers.{i}"
        sd.update(
            _torch_sd(f"{key}.self_attention_visual.self_attn", _mha_torch(d, cfg.n_heads))
        )
        sd.update(
            _torch_sd(f"{key}.self_attention_visual.norm1", torch.nn.LayerNorm(d))
        )
        sd.update(
            _torch_sd(f"{key}.self_attention_lang.self_attn", _mha_torch(d, cfg.n_heads))
        )
        sd.update(_torch_sd(f"{key}.self_attention_lang.norm1", torch.nn.LayerNorm(d)))
        for name in ("cross_lv", "cross_vl", "cross_d"):
            sd.update(
                _torch_sd(f"{key}.cross_layer.{name}", _mha_torch(d, cfg.n_heads))
            )
        for name in ("norm_lv", "norm_lv2", "norm_vl", "norm_vl2", "norm_d"):
            sd.update(_torch_sd(f"{key}.cross_layer.{name}", torch.nn.LayerNorm(d)))
        for name in ("ffn_lv", "ffn_vl"):
            sd.update(
                _torch_sd(
                    f"{key}.cross_layer.{name}", _ffn_torch(d, cfg.dim_feedforward)
                )
            )

    # points_obj_cls (modules.py:19-49)
    sd.update(_torch_sd("points_obj_cls.conv1", torch.nn.Conv1d(d, d, 1)))
    sd.update(_torch_sd("points_obj_cls.bn1", torch.nn.BatchNorm1d(d)))
    sd.update(_torch_sd("points_obj_cls.conv2", torch.nn.Conv1d(d, d, 1)))
    sd.update(_torch_sd("points_obj_cls.bn2", torch.nn.BatchNorm1d(d)))
    sd.update(_torch_sd("points_obj_cls.conv3", torch.nn.Conv1d(d, 1, 1)))

    sd.update(_torch_sd("decoder_query_proj", torch.nn.Conv1d(d, d, 1)))

    def head(prefix):
        sd.update(
            _torch_sd(f"{prefix}.center_residual_head", _three_mlp_torch(d, 3))
        )
        sd.update(_torch_sd(f"{prefix}.size_pred_head", _three_mlp_torch(d, 3)))
        sd.update(
            _torch_sd(
                f"{prefix}.sem_cls_scores_head", _three_mlp_torch(d, cfg.num_class)
            )
        )

    head("proposal_head")
    for i in range(cfg.num_decoder_layers):
        key = f"decoder.{i}"
        for name in ("self_attn", "cross_l", "cross_d", "cross_v"):
            sd.update(_torch_sd(f"{key}.{name}", _mha_torch(d, cfg.n_heads)))
        for name in ("norm1", "norm_l", "norm_d", "norm_v", "norm2"):
            sd.update(_torch_sd(f"{key}.{name}", torch.nn.LayerNorm(d)))
        sd.update(_torch_sd(f"{key}.ffn", _ffn_torch(d, cfg.dim_feedforward)))
        sd.update(_torch_sd(f"{key}.self_posembed", _pos_embed_torch(6, d)))
        head(f"prediction_heads.{i}")

    for name in (
        "contrastive_align_projection_image",
        "contrastive_align_projection_text",
    ):
        sd.update(_torch_sd(f"{name}.0", torch.nn.Linear(d, d)))
        sd.update(_torch_sd(f"{name}.2", torch.nn.Linear(d, d)))
        sd.update(_torch_sd(f"{name}.4", torch.nn.Linear(d, cfg.contrastive_dim)))

    return {
        k: np.asarray(v)
        for k, v in sd.items()
        if "num_batches_tracked" not in k
    }


def _count_leaves(tree):
    return len(jax.tree_util.tree_leaves(tree))


def test_full_checkpoint_covers_entire_model_tree():
    """Every param AND batch_stats leaf of the tiny butd grounder loads from
    a fabricated reference-named state dict — the VERDICT 'forward-parity
    path' structural requirement."""
    from eda_tpu.data.synthetic import SyntheticConfig, SyntheticScenes
    from eda_tpu.models import EDAGrounder

    cfg = TINY
    gen = SyntheticScenes(
        SyntheticConfig(
            num_points=cfg.num_points, num_objects=4, text_len=32, max_objects=16
        ),
        vocab_size=cfg.text_vocab_size,
    )
    batch = jax.tree_util.tree_map(jnp.asarray, gen.batch(range(2), butd=True))
    model = EDAGrounder(cfg)
    variables = jax.jit(
        lambda: model.init(jax.random.key(0), batch["inputs"], train=False)
    )()

    sd = fabricate_eda_state_dict(cfg)
    params, stats = convert_eda_checkpoint(sd, cfg)

    merged_params, n_p = merge_into(variables["params"], params)
    merged_stats, n_s = merge_into(variables["batch_stats"], stats)
    assert n_p == _count_leaves(variables["params"]), "params not fully covered"
    assert n_s == _count_leaves(variables["batch_stats"]), "stats not fully covered"

    # and the merged tree still runs
    out = model.apply(
        {"params": merged_params, "batch_stats": merged_stats},
        batch["inputs"],
        train=False,
    )
    assert np.isfinite(np.asarray(out["last_center"])).all()


def test_residual_attn_matches_torch():
    """ResidualAttn == torch MultiheadAttention + residual + LayerNorm,
    incl. q_pos on query and key_padding_mask semantics."""
    torch.manual_seed(1)
    d, heads, B, Lq, Lk = 32, 4, 2, 5, 7
    mha = _mha_torch(d, heads).eval()
    norm = torch.nn.LayerNorm(d).eval()
    sd = {**_torch_sd("attn", mha), **_torch_sd("norm", norm)}
    flax_params = _residual_attn(
        {k: np.asarray(v) for k, v in sd.items()}, "attn", "norm", heads
    )

    rng = np.random.default_rng(2)
    x = rng.normal(size=(B, Lq, d)).astype(np.float32)
    k = rng.normal(size=(B, Lk, d)).astype(np.float32)
    pos = rng.normal(size=(B, Lq, d)).astype(np.float32)
    valid = np.ones((B, Lk), bool)
    valid[:, -2:] = False

    with torch.no_grad():
        q_t = torch.from_numpy(x + pos).transpose(0, 1)
        k_t = torch.from_numpy(k).transpose(0, 1)
        a = mha(q_t, k_t, k_t, key_padding_mask=torch.from_numpy(~valid))[0]
        want = norm(torch.from_numpy(x) + a.transpose(0, 1)).numpy()

    from eda_tpu.models.layers import ResidualAttn

    mod = ResidualAttn(d, heads, dropout=0.0)
    got = mod.apply(
        {"params": flax_params},
        jnp.asarray(x), jnp.asarray(k), jnp.asarray(k), jnp.asarray(valid),
        train=False, q_pos=jnp.asarray(pos),
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_pos_embed_matches_torch():
    torch.manual_seed(3)
    mod_t = _pos_embed_torch(6, 24).eval()
    sd = {k: np.asarray(v) for k, v in _torch_sd("pe", mod_t).items()}
    params, stats = _pos_embed(sd, "pe")

    rng = np.random.default_rng(4)
    coords = rng.normal(size=(2, 9, 6)).astype(np.float32)
    with torch.no_grad():
        want = (
            mod_t.position_embedding_head(torch.from_numpy(coords).transpose(1, 2))
            .transpose(1, 2)
            .numpy()
        )

    from eda_tpu.models.layers import PositionEmbeddingLearned

    got = PositionEmbeddingLearned(24).apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(coords),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_three_layer_mlp_matches_torch():
    torch.manual_seed(5)
    mod_t = _three_mlp_torch(16, 7).eval()
    sd = {k: np.asarray(v) for k, v in _torch_sd("m", mod_t).items()}
    params, stats = _three_mlp(sd, "m")

    rng = np.random.default_rng(6)
    x = rng.normal(size=(2, 11, 16)).astype(np.float32)
    with torch.no_grad():
        want = mod_t.net(torch.from_numpy(x).transpose(1, 2)).transpose(1, 2).numpy()

    from eda_tpu.models.layers import ThreeLayerMLP

    got = ThreeLayerMLP(16, 7).apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_shared_mlp_and_backbone_mapping_match_torch():
    """Gather-path SA SharedMLP == reference Conv2d+BN2d tower in eval."""
    torch.manual_seed(7)
    chans = [6, 8, 8, 12]
    convs = []
    sd = {}
    for j in range(3):
        conv = torch.nn.Conv2d(chans[j], chans[j + 1], 1, bias=False)
        bn = torch.nn.BatchNorm2d(chans[j + 1])
        # randomize running stats so the mapping is actually exercised
        bn.running_mean.normal_()
        bn.running_var.uniform_(0.5, 2.0)
        convs.append((conv.eval(), bn.eval()))
        sd.update(_torch_sd(f"sa.layer{j}.conv", conv))
        sd.update(_torch_sd(f"sa.layer{j}.bn.bn", bn))
    params, stats = _shared_mlp(
        {k: np.asarray(v) for k, v in sd.items()}, "sa", 3
    )

    rng = np.random.default_rng(8)
    x = rng.normal(size=(2, 10, 4, 6)).astype(np.float32)  # (B, M, ns, C)
    with torch.no_grad():
        h = torch.from_numpy(x).permute(0, 3, 1, 2)  # (B, C, M, ns)
        for conv, bn in convs:
            h = torch.relu(bn(conv(h)))
        want = h.permute(0, 2, 3, 1).numpy()

    from eda_tpu.models.pointnet2 import SharedMLP

    got = SharedMLP((8, 8, 12)).apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_backbone_warmstart_pp_checkpoint():
    """convert_backbone maps a full-detector checkpoint (backbone_net.
    prefixes) onto the gather backbone subtree (bdetr.py:67-70)."""
    cfg = TINY
    sd = {
        k: v
        for k, v in fabricate_eda_state_dict(cfg).items()
        if k.startswith("backbone_net.")
    }
    params, stats = convert_backbone(sd, cfg)
    assert set(params) == {"sa1", "sa2", "sa3", "sa4", "fp1", "fp2"}
    # kernel shapes: first SA layer consumes 3 + input_feature_dim channels
    k0 = params["sa1"]["SharedMLP_0"]["Dense_0"]["kernel"]
    assert k0.shape == (3 + cfg.input_feature_dim, cfg.sa_mlps[0][0])

    # fused path: kernels transfer as w{i}
    fused_cfg = dataclasses.replace(cfg, sa_impl="fused")
    fparams, fstats = convert_backbone(sd, fused_cfg)
    assert set(fparams["sa1"]) == {"w0", "w1", "w2"}
    np.testing.assert_allclose(fparams["sa1"]["w0"], k0)


def test_warm_start_pipeline(tmp_path):
    """warm_start consumes pp_checkpoint + class_embeddings3d.npy + local
    roberta weights exactly like the reference model init (bdetr.py:63-95)."""
    from eda_tpu.data.synthetic import SyntheticConfig, SyntheticScenes
    from eda_tpu.models import EDAGrounder
    from eda_tpu.train.convert import warm_start

    cfg = TINY
    gen = SyntheticScenes(
        SyntheticConfig(
            num_points=cfg.num_points, num_objects=4, text_len=32, max_objects=16
        ),
        vocab_size=cfg.text_vocab_size,
    )
    batch = jax.tree_util.tree_map(jnp.asarray, gen.batch(range(1), butd=True))
    model = EDAGrounder(cfg)
    variables = jax.jit(
        lambda: model.init(jax.random.key(0), batch["inputs"], train=False)
    )()

    sd = fabricate_eda_state_dict(cfg)
    backbone_sd = {k: v for k, v in sd.items() if k.startswith("backbone_net.")}
    torch.save(backbone_sd, tmp_path / "gf_detector.pth")

    table = np.random.default_rng(1).normal(
        size=(cfg.num_obj_class, cfg.butd_class_embed_dim)
    ).astype(np.float32)
    np.save(tmp_path / "class_embeddings3d.npy", table)

    rb = tmp_path / "roberta-base"
    rb.mkdir()
    text_sd = {
        k[len("text_encoder."):]: torch.from_numpy(np.asarray(v))
        for k, v in sd.items()
        if k.startswith("text_encoder.")
    }
    torch.save(text_sd, rb / "pytorch_model.bin")

    logs = []
    params, stats = warm_start(
        variables["params"],
        variables["batch_stats"],
        cfg,
        pp_checkpoint=str(tmp_path / "gf_detector.pth"),
        data_root=str(tmp_path),
        log=logs.append,
    )
    # backbone leaves replaced
    got = params["backbone_net"]["sa1"]["SharedMLP_0"]["Dense_0"]["kernel"]
    want = np.asarray(sd["backbone_net.sa1.mlp_module.layer0.conv.weight"])
    np.testing.assert_allclose(np.asarray(got), want[:, :, 0, 0].T)
    # class table loaded verbatim
    np.testing.assert_allclose(
        np.asarray(params["butd_class_embeddings"]["embedding"]), table
    )
    # roberta word embeddings loaded
    np.testing.assert_allclose(
        np.asarray(
            params["text_encoder"]["embeddings"]["word_embeddings"]["embedding"]
        ),
        np.asarray(sd["text_encoder.embeddings.word_embeddings.weight"]),
    )
    assert len(logs) == 3, logs
