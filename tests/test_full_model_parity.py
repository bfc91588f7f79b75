"""FULL-MODEL differential parity: the reference BeaUTyDETR end-to-end.

The reference model (``/root/reference/models/bdetr.py``) runs on CPU with

* its CUDA extension replaced by bit-faithful torch ports of the six
  kernels (``pointnet2/_ext_src/src/*.cu`` — FPS with the 1e-3 origin
  guard, first-k-in-index-order ball query, brute-force 3-NN with
  first-min tie-breaking, gathers/grouping/interpolation);
* its RoBERTa + tokenizer loaded from a fabricated local ``roberta-base``
  (tiny random-weight config, byte-level BPE vocab with no merges).

Its real state dict is converted by ``convert_eda_checkpoint`` and the
SAME inputs (identical token ids from the same tokenizer) run through
``EDAGrounder`` with ``sa_impl='gather'`` + ``sa_ball_mode='first'``.
Every prefix's end_points must agree — this replaces the fabricated
state-dict oracles of ``test_convert_eda.py`` with the reference's actual
module tree and forward pass.
"""

from __future__ import annotations

import dataclasses
import importlib
import importlib.machinery
import importlib.util
import json
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

REF = "/root/reference"

B, N_POINTS = 2, 4096
NUM_QUERIES = 64
NUM_DEC = 2
TEXT = ["the brown chair next to the table", "a lamp on the desk"]


# ---------------------------------------------------------------------------
# torch ports of pointnet2._ext (CUDA kernel semantics, forward only)
# ---------------------------------------------------------------------------


def _ext_fps(xyz: torch.Tensor, npoint: int) -> torch.Tensor:
    """sampling_gpu.cu:75-130: start at index 0; min-distance argmax per
    step; points with |p|^2 <= 1e-3 are never candidates (padding guard)."""
    Bb, N, _ = xyz.shape
    inds = torch.zeros(Bb, npoint, dtype=torch.int32)
    temp = torch.full((Bb, N), 1e10)
    skip = (xyz**2).sum(-1) <= 1e-3
    old = torch.zeros(Bb, dtype=torch.long)
    rows = torch.arange(Bb)
    for j in range(1, npoint):
        d = ((xyz - xyz[rows, old][:, None]) ** 2).sum(-1)
        temp = torch.where(skip, temp, torch.minimum(d, temp))
        old = temp.masked_fill(skip, -1.0).argmax(-1)
        inds[:, j] = old.int()
    return inds


def _ext_gather_points(features: torch.Tensor, idx: torch.Tensor):
    """sampling_gpu.cu:13-25: out[b,c,j] = features[b,c,idx[b,j]]."""
    return torch.gather(
        features, 2, idx.long()[:, None].expand(-1, features.shape[1], -1)
    )


def _ext_ball_query(new_xyz, xyz, radius, nsample):
    """ball_query_gpu.cu:14-49: first nsample indices with d2 < r^2 in
    index order; the first hit back-fills all slots; no hit -> zeros."""
    d2 = ((new_xyz[:, :, None] - xyz[:, None]) ** 2).sum(-1)  # (B, M, N)
    mask = d2 < radius * radius
    Bb, M, N = mask.shape
    any_hit = mask.any(-1)
    first = mask.int().argmax(-1).int()  # 0 when no hit
    out = torch.where(
        any_hit[..., None], first[..., None], torch.zeros(1, dtype=torch.int32)
    ).repeat(1, 1, nsample)
    cums = mask.cumsum(-1)
    bi, mi, ni = torch.where(mask & (cums <= nsample))
    out[bi, mi, cums[bi, mi, ni] - 1] = ni.int()
    return out


def _ext_group_points(features, idx):
    """group_points_gpu.cu:13-33: out[b,c,j,k] = features[b,c,idx[b,j,k]]."""
    Bb, C, _ = features.shape
    _, M, ns = idx.shape
    flat = idx.reshape(Bb, 1, M * ns).long().expand(-1, C, -1)
    return torch.gather(features, 2, flat).reshape(Bb, C, M, ns)


def _ext_three_nn(unknown, known):
    """interpolate_gpu.cu:14-60: brute-force 3 smallest squared distances,
    first-minimum tie-breaking (strict <)."""
    d2 = ((unknown[:, :, None] - known[:, None]) ** 2).sum(-1)  # (B, n, m)
    dists, idxs = [], []
    work = d2.clone()
    for _ in range(3):
        val, idx = work.min(-1)  # first minimum
        dists.append(val)
        idxs.append(idx.int())
        work.scatter_(-1, idx[..., None], torch.inf)
    return torch.stack(dists, -1), torch.stack(idxs, -1)


def _ext_three_interpolate(features, idx, weight):
    """interpolate_gpu.cu:66-96: weighted sum of 3 neighbor features."""
    Bb, C, m = features.shape
    _, n, _ = idx.shape
    flat = idx.reshape(Bb, 1, n * 3).long().expand(-1, C, -1)
    neigh = torch.gather(features, 2, flat).reshape(Bb, C, n, 3)
    return (neigh * weight[:, None]).sum(-1)


def _install_ext_stub():
    pkg = sys.modules.get("pointnet2")
    if pkg is None:
        pkg = types.ModuleType("pointnet2")
        pkg.__spec__ = importlib.machinery.ModuleSpec("pointnet2", loader=None)
        pkg.__path__ = []
        sys.modules["pointnet2"] = pkg
    ext = types.ModuleType("pointnet2._ext")
    ext.__spec__ = importlib.machinery.ModuleSpec(
        "pointnet2._ext", loader=None
    )
    ext.furthest_point_sampling = _ext_fps
    ext.gather_points = _ext_gather_points
    ext.ball_query = _ext_ball_query
    ext.group_points = _ext_group_points
    ext.three_nn = _ext_three_nn
    ext.three_interpolate = _ext_three_interpolate
    sys.modules["pointnet2._ext"] = ext
    pkg._ext = ext
    return pkg


@pytest.fixture(scope="module")
def ref_bdetr():
    """Import the REAL models/bdetr.py with the CUDA extension stubbed."""
    pkg = _install_ext_stub()
    if f"{REF}/pointnet2" not in sys.path:
        sys.path.insert(0, f"{REF}/pointnet2")  # pytorch_utils etc. top-level
    # the real wrapper module, as BOTH spellings in use:
    # top-level 'pointnet2_utils' (pointnet2_modules) and
    # 'pointnet2.pointnet2_utils' (models/modules.py)
    spec = importlib.util.spec_from_file_location(
        "pointnet2_utils", f"{REF}/pointnet2/pointnet2_utils.py"
    )
    p2u = importlib.util.module_from_spec(spec)
    sys.modules["pointnet2_utils"] = p2u
    spec.loader.exec_module(p2u)
    sys.modules["pointnet2.pointnet2_utils"] = p2u
    pkg.pointnet2_utils = p2u

    models_pkg = sys.modules.get("models")
    if models_pkg is None:
        models_pkg = types.ModuleType("models")
        models_pkg.__spec__ = importlib.machinery.ModuleSpec(
            "models", loader=None
        )
        sys.modules["models"] = models_pkg
    models_pkg.__path__ = [f"{REF}/models"]
    for stale in ("models.modules", "models.backbone_module",
                  "models.encoder_decoder_layers", "models.bdetr"):
        sys.modules.pop(stale, None)
    return importlib.import_module("models.bdetr")


@pytest.fixture(scope="module")
def roberta_data_path(tmp_path_factory):
    """A parent dir holding a fabricated roberta-base/: tiny random
    RobertaModel + a byte-level BPE tokenizer with no merges."""
    from transformers import RobertaConfig, RobertaModel, RobertaTokenizerFast
    from transformers.models.gpt2.tokenization_gpt2 import bytes_to_unicode

    parent = tmp_path_factory.mktemp("hf")
    d = parent / "roberta-base"
    d.mkdir()
    vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3}
    for ch in sorted(bytes_to_unicode().values()):
        vocab[ch] = len(vocab)
    vocab["<mask>"] = len(vocab)
    with open(d / "vocab.json", "w") as f:
        json.dump(vocab, f)
    with open(d / "merges.txt", "w") as f:
        f.write("#version: 0.2\n")
    tok = RobertaTokenizerFast(
        vocab_file=str(d / "vocab.json"), merges_file=str(d / "merges.txt")
    )
    tok.save_pretrained(str(d))
    torch.manual_seed(7)
    cfg = RobertaConfig(
        vocab_size=len(vocab),
        hidden_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=128,
        max_position_embeddings=514,
        type_vocab_size=1,
    )
    RobertaModel(cfg).save_pretrained(str(d), safe_serialization=False)
    return str(parent) + "/"


def _inputs(rng, butd: bool):
    pc = rng.uniform(-2.0, 2.0, (B, N_POINTS, 6)).astype(np.float32)
    # coordinates on a 1/64 grid: every squared distance is then EXACTLY
    # representable in f32, so FPS argmax / ball-query membership / 3-NN
    # ordering are bit-identical between torch and jax (continuous inputs
    # reorder late FPS picks via last-ulp rounding differences; ties break
    # to the first index on both sides)
    pc[..., :3] = np.round(pc[..., :3] * 64.0) / 64.0
    pc[..., 3:] = rng.uniform(0.0, 1.0, (B, N_POINTS, 3))
    out = {"point_clouds": pc, "text": list(TEXT)}
    if butd:
        centers = rng.uniform(-1.5, 1.5, (B, 132, 3))
        sizes = rng.uniform(0.2, 1.2, (B, 132, 3))
        out["det_boxes"] = np.concatenate([centers, sizes], -1).astype(
            np.float32
        )
        out["det_class_ids"] = rng.integers(0, 485, (B, 132)).astype(np.int64)
        mask = np.ones((B, 132), bool)
        mask[0, 100:] = False
        out["det_bbox_label_mask"] = mask
    return out


@pytest.mark.slow
@pytest.mark.parametrize("butd", [False, True])
def test_full_model_forward_parity(
    ref_bdetr, roberta_data_path, tmp_path, monkeypatch, butd
):
    from eda_tpu.config import ModelConfig
    from eda_tpu.models import EDAGrounder
    from eda_tpu.models.tokenizer import HFTokenizer
    from eda_tpu.train.convert import convert_eda_checkpoint, merge_into

    monkeypatch.chdir(REF)  # bdetr reads data/class_embeddings3d.npy via cwd
    torch.manual_seed(11)
    ref = ref_bdetr.BeaUTyDETR(
        num_class=256,
        num_obj_class=485,
        input_feature_dim=3,
        num_queries=NUM_QUERIES,
        num_decoder_layers=NUM_DEC,
        self_position_embedding="loc_learned",
        contrastive_align_loss=True,
        d_model=288,
        butd=butd,
        pointnet_ckpt=None,
        data_path=roberta_data_path,
        self_attend=True,
    )
    ref.eval()
    with torch.no_grad():
        # sharpen the KPS objectness head: top-64-of-1024 selection must be
        # insensitive to ~1e-3 cross-framework activation noise, so scale
        # the final logit conv until rank gaps dwarf it (weights stay the
        # shared source of truth — the converter sees the scaled values)
        ref.points_obj_cls.conv3.weight *= 25.0
        ref.points_obj_cls.conv3.bias *= 25.0

    # seeds chosen so the KPS top-64 boundary has a clear margin (boundary
    # near-ties flip on ~1e-3 cross-framework activation noise)
    rng = np.random.default_rng(21 if not butd else 25)
    inputs = _inputs(rng, butd)
    with torch.no_grad():
        ref_ep = ref(
            {
                k: (torch.from_numpy(v) if isinstance(v, np.ndarray) else v)
                for k, v in inputs.items()
            }
        )

    # ---- ours: same weights via the converter, same token ids ----
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    hf_cfg = json.load(open(roberta_data_path + "roberta-base/config.json"))
    cfg = dataclasses.replace(
        ModelConfig(),
        num_points=N_POINTS,
        num_queries=NUM_QUERIES,
        num_decoder_layers=NUM_DEC,
        sa_impl="gather",
        sa_ball_mode="first",
        points_presorted=False,
        butd=butd,
        text_vocab_size=hf_cfg["vocab_size"],
        text_hidden=hf_cfg["hidden_size"],
        text_layers=hf_cfg["num_hidden_layers"],
        text_heads=hf_cfg["num_attention_heads"],
        text_intermediate=hf_cfg["intermediate_size"],
        use_bf16=False,
    )
    tok = HFTokenizer(roberta_data_path + "roberta-base")
    # the reference pads to the longest sequence in the batch
    lengths = [
        len(tok._tok(t)["input_ids"]) for t in TEXT
    ]
    L = max(lengths)
    batch_tok = tok.encode_batch(TEXT, max_len=L)

    our_inputs = {
        "point_clouds": jnp.asarray(inputs["point_clouds"]),
        "text_ids": jnp.asarray(batch_tok.input_ids),
        "text_mask": jnp.asarray(batch_tok.attention_mask),
    }
    if butd:
        our_inputs["det_boxes"] = jnp.asarray(inputs["det_boxes"])
        our_inputs["det_class_ids"] = jnp.asarray(
            inputs["det_class_ids"].astype(np.int32)
        )
        our_inputs["det_mask"] = jnp.asarray(inputs["det_bbox_label_mask"])

    model = EDAGrounder(cfg)
    variables = model.init(jax.random.key(0), our_inputs, train=False)
    params, stats = convert_eda_checkpoint(sd, cfg)
    merged_params, _ = merge_into(variables["params"], params)
    merged_stats, _ = merge_into(variables["batch_stats"], stats)
    ours = model.apply(
        {"params": merged_params, "batch_stats": merged_stats},
        our_inputs,
        train=False,
    )

    # sampling decisions must agree exactly before numerics are comparable
    np.testing.assert_array_equal(
        np.asarray(ours["seed_inds"]), ref_ep["seed_inds"].numpy()
    )
    np.testing.assert_array_equal(
        np.asarray(ours["query_points_sample_inds"]),
        ref_ep["query_points_sample_inds"].numpy(),
    )

    def close(key, ref_val, atol):
        np.testing.assert_allclose(
            np.asarray(ours[key], np.float32),
            ref_val.numpy(),
            atol=atol,
            err_msg=key,
        )

    close("seeds_obj_cls_logits",
          ref_ep["seeds_obj_cls_logits"].squeeze(1), 5e-2)  # x25 head scale
    # text-side outputs: compare REAL token positions only — pad-position
    # features are arbitrary on both sides (pads are masked as attention
    # KEYS everywhere; nothing downstream reads them)
    real = np.asarray(batch_tok.attention_mask)[..., None]
    np.testing.assert_allclose(
        np.asarray(ours["proj_tokens"], np.float32) * real,
        ref_ep["proj_tokens"].numpy() * real,
        atol=2e-3,
        err_msg="proj_tokens (real positions)",
    )
    prefixes = ["proposal_"] + [
        f"{i}head_" for i in range(NUM_DEC - 1)
    ] + ["last_"]
    for prefix in prefixes:
        for key, atol in (
            ("center", 5e-3), ("pred_size", 5e-3), ("sem_cls_scores", 2e-2),
        ):
            close(prefix + key, ref_ep[prefix + key], atol)
        if prefix != "proposal_":
            close(prefix + "proj_queries", ref_ep[prefix + "proj_queries"], 5e-3)
    close("proposal_proj_queries", ref_ep["proposal_proj_queries"], 5e-3)


@pytest.mark.slow
def test_full_model_train_mode_parity(ref_bdetr, roberta_data_path, monkeypatch):
    """TRAIN-mode forward parity (BatchNorm normalizes by batch statistics)
    plus running-stat update parity, dropout zeroed on both sides.

    Flax momentum 0.9 == torch momentum 0.1 for the running means exactly;
    torch feeds the UNBIASED batch variance into running_var while flax
    uses the biased one — a known n/(n-1) factor (<=0.4% at these batch
    shapes), asserted with a matching rtol and documented here rather than
    patched into the model."""
    from eda_tpu.config import ModelConfig
    from eda_tpu.models import EDAGrounder
    from eda_tpu.models.tokenizer import HFTokenizer
    from eda_tpu.train.convert import convert_eda_checkpoint, merge_into

    monkeypatch.chdir(REF)
    torch.manual_seed(11)
    ref = ref_bdetr.BeaUTyDETR(
        num_class=256, num_obj_class=485, input_feature_dim=3,
        num_queries=NUM_QUERIES, num_decoder_layers=NUM_DEC,
        self_position_embedding="loc_learned", contrastive_align_loss=True,
        d_model=288, butd=False, pointnet_ckpt=None,
        data_path=roberta_data_path, self_attend=True,
    )
    ref.train()
    for m in ref.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
        if isinstance(m, torch.nn.MultiheadAttention):
            m.dropout = 0.0  # internal float, not an nn.Dropout module

    # capture weights BEFORE the train-mode forward mutates the running
    # stats (and copy: torch .numpy() shares the live buffers)
    sd = {k: v.detach().numpy().copy() for k, v in ref.state_dict().items()}

    rng = np.random.default_rng(21)
    inputs = _inputs(rng, False)
    with torch.no_grad():
        ref_ep = ref(
            {
                k: (torch.from_numpy(v) if isinstance(v, np.ndarray) else v)
                for k, v in inputs.items()
            }
        )

    hf_cfg = json.load(open(roberta_data_path + "roberta-base/config.json"))
    cfg = dataclasses.replace(
        ModelConfig(),
        num_points=N_POINTS, num_queries=NUM_QUERIES,
        num_decoder_layers=NUM_DEC, sa_impl="gather", sa_ball_mode="first",
        points_presorted=False, butd=False, dropout=0.0,
        text_vocab_size=hf_cfg["vocab_size"], text_hidden=hf_cfg["hidden_size"],
        text_layers=hf_cfg["num_hidden_layers"],
        text_heads=hf_cfg["num_attention_heads"],
        text_intermediate=hf_cfg["intermediate_size"], use_bf16=False,
    )
    tok = HFTokenizer(roberta_data_path + "roberta-base")
    L = max(len(tok._tok(t)["input_ids"]) for t in TEXT)
    batch_tok = tok.encode_batch(TEXT, max_len=L)
    our_inputs = {
        "point_clouds": jnp.asarray(inputs["point_clouds"]),
        "text_ids": jnp.asarray(batch_tok.input_ids),
        "text_mask": jnp.asarray(batch_tok.attention_mask),
    }
    model = EDAGrounder(cfg)
    variables = model.init(jax.random.key(0), our_inputs, train=False)
    params, stats = convert_eda_checkpoint(sd, cfg)
    merged_params, _ = merge_into(variables["params"], params)
    merged_stats, _ = merge_into(variables["batch_stats"], stats)
    ours, mutated = model.apply(
        {"params": merged_params, "batch_stats": merged_stats},
        our_inputs,
        train=True,
        mutable=["batch_stats"],
        rngs={"dropout": jax.random.key(1)},
    )

    np.testing.assert_array_equal(
        np.asarray(ours["seed_inds"]), ref_ep["seed_inds"].numpy()
    )
    # pre-query tensors only: the train-mode batch-stat normalization
    # amplifies cross-framework float noise to ~2e-3 on the KPS logits,
    # which flips top-64 boundary picks — query identity can't be asserted
    # here (the decoder path is pinned by the eval-mode test; THIS test
    # pins BN train-mode normalization and the running-stat updates)
    for key, ref_t, atol in (
        ("sa1_features", ref_ep["sa1_features"].transpose(1, 2), 1e-4),
        ("fp2_features", ref_ep["fp2_features"].transpose(1, 2), 1e-3),
        ("seed_features", ref_ep["seed_features"].transpose(1, 2), 5e-3),
        ("seeds_obj_cls_logits", ref_ep["seeds_obj_cls_logits"].squeeze(1), 5e-3),
    ):
        np.testing.assert_allclose(
            np.asarray(ours[key], np.float32),
            ref_t.numpy(),
            atol=atol,
            err_msg=key,
        )

    # BN running-stat updates: sa1 layer-0 BN (flax path
    # backbone_net/sa1/SharedMLP_0/BatchNorm_0 vs torch sa1.mlp_module
    # .layer0.bn.bn) — torch momentum 0.1 <-> flax 0.9
    new_stats = mutated["batch_stats"]
    ref_sd = ref.state_dict()
    got = new_stats["backbone_net"]["sa1"]["SharedMLP_0"]["BatchNorm_0"]
    want_mean = ref_sd["backbone_net.sa1.mlp_module.layer0.bn.bn.running_mean"].numpy()
    want_var = ref_sd["backbone_net.sa1.mlp_module.layer0.bn.bn.running_var"].numpy()
    np.testing.assert_allclose(np.asarray(got["mean"]), want_mean, atol=1e-5)
    # unbiased-vs-biased batch variance: n/(n-1) on the update term only
    np.testing.assert_allclose(np.asarray(got["var"]), want_var, rtol=5e-3)


@pytest.mark.slow
def test_real_pth_checkpoint_ingestion(
    ref_bdetr, roberta_data_path, tmp_path, monkeypatch
):
    """A torch .pth saved from the REAL reference module tree (DDP 'module.'
    prefixes, the reference save_checkpoint payload) loads through
    load_eda_pth into a full EDAGrounder variable tree — every param and
    stat leaf covered, epoch restored — replacing the fabricated state-dict
    fixture as the oracle for checkpoint ingestion."""
    from eda_tpu.config import ModelConfig
    from eda_tpu.models import EDAGrounder
    from eda_tpu.models.tokenizer import HFTokenizer
    from eda_tpu.train.convert import load_eda_pth

    monkeypatch.chdir(REF)
    torch.manual_seed(13)
    ref = ref_bdetr.BeaUTyDETR(
        num_class=256, num_obj_class=485, input_feature_dim=3,
        num_queries=NUM_QUERIES, num_decoder_layers=NUM_DEC,
        self_position_embedding="loc_learned", contrastive_align_loss=True,
        d_model=288, butd=True, pointnet_ckpt=None,
        data_path=roberta_data_path, self_attend=True,
    )
    payload = {
        "config": {"dummy": True},
        "model": {"module." + k: v for k, v in ref.state_dict().items()},
        "optimizer": {},
        "scheduler": {},
        "epoch": 41,
    }
    pth = tmp_path / "ckpt_epoch_41.pth"
    torch.save(payload, str(pth))

    hf_cfg = json.load(open(roberta_data_path + "roberta-base/config.json"))
    cfg = dataclasses.replace(
        ModelConfig(),
        num_points=2048, num_queries=NUM_QUERIES, num_decoder_layers=NUM_DEC,
        sa_impl="gather", sa_ball_mode="first", points_presorted=False,
        butd=True, text_vocab_size=hf_cfg["vocab_size"],
        text_hidden=hf_cfg["hidden_size"],
        text_layers=hf_cfg["num_hidden_layers"],
        text_heads=hf_cfg["num_attention_heads"],
        text_intermediate=hf_cfg["intermediate_size"], use_bf16=False,
    )
    tok = HFTokenizer(roberta_data_path + "roberta-base")
    bt = tok.encode_batch(["the chair"], max_len=8)
    rng = np.random.default_rng(0)
    inputs = {
        "point_clouds": jnp.asarray(
            rng.uniform(-1, 1, (1, 2048, 6)).astype(np.float32)
        ),
        "text_ids": jnp.asarray(bt.input_ids),
        "text_mask": jnp.asarray(bt.attention_mask),
        "det_boxes": jnp.asarray(
            rng.uniform(0, 1, (1, 132, 6)).astype(np.float32)
        ),
        "det_class_ids": jnp.zeros((1, 132), jnp.int32),
        "det_mask": jnp.ones((1, 132), bool),
    }
    model = EDAGrounder(cfg)
    variables = model.init(jax.random.key(0), inputs, train=False)

    n_param_leaves = len(jax.tree_util.tree_leaves(variables["params"]))
    n_stat_leaves = len(jax.tree_util.tree_leaves(variables["batch_stats"]))
    logs = []
    params, stats, start_epoch = load_eda_pth(
        str(pth), variables["params"], variables["batch_stats"], cfg,
        log=logs.append,
    )
    assert start_epoch == 42
    msg = logs[0]
    assert f"{n_param_leaves} param" in msg and f"{n_stat_leaves} stat" in msg
    # converted values really landed (not the random init)
    want = ref.state_dict()["points_obj_cls.conv3.bias"].numpy()
    got = np.asarray(params["points_obj_cls"]["Dense_2"]["bias"])
    np.testing.assert_allclose(got, want, atol=1e-7)
