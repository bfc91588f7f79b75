"""Weight-converter tests: HF RoBERTa state dict + reference .pth loading."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eda_tpu.models.roberta import RobertaEncoder, convert_hf_state_dict


def fabricate_hf_state_dict(rng, vocab=64, hidden=16, layers=2, inter=32):
    sd = {}
    sd["embeddings.word_embeddings.weight"] = rng.normal(size=(vocab, hidden))
    sd["embeddings.position_embeddings.weight"] = rng.normal(size=(514, hidden))
    sd["embeddings.LayerNorm.weight"] = np.ones(hidden)
    sd["embeddings.LayerNorm.bias"] = np.zeros(hidden)
    for i in range(layers):
        p = f"encoder.layer.{i}"
        for name in ("query", "key", "value"):
            sd[f"{p}.attention.self.{name}.weight"] = rng.normal(size=(hidden, hidden))
            sd[f"{p}.attention.self.{name}.bias"] = rng.normal(size=(hidden,))
        sd[f"{p}.attention.output.dense.weight"] = rng.normal(size=(hidden, hidden))
        sd[f"{p}.attention.output.dense.bias"] = rng.normal(size=(hidden,))
        sd[f"{p}.attention.output.LayerNorm.weight"] = np.ones(hidden)
        sd[f"{p}.attention.output.LayerNorm.bias"] = np.zeros(hidden)
        sd[f"{p}.intermediate.dense.weight"] = rng.normal(size=(inter, hidden))
        sd[f"{p}.intermediate.dense.bias"] = rng.normal(size=(inter,))
        sd[f"{p}.output.dense.weight"] = rng.normal(size=(hidden, inter))
        sd[f"{p}.output.dense.bias"] = rng.normal(size=(hidden,))
        sd[f"{p}.output.LayerNorm.weight"] = np.ones(hidden)
        sd[f"{p}.output.LayerNorm.bias"] = np.zeros(hidden)
    return {k: v.astype(np.float32) for k, v in sd.items()}


def test_hf_conversion_structure_matches_flax(rng):
    hidden, layers, heads = 16, 2, 4
    sd = fabricate_hf_state_dict(rng, hidden=hidden, layers=layers)
    params = convert_hf_state_dict(sd, num_layers=layers, heads=heads)

    enc = RobertaEncoder(
        vocab_size=64, hidden=hidden, num_layers=layers, heads=heads,
        intermediate=32,
    )
    ids = jnp.asarray(rng.integers(0, 64, (2, 8)).astype(np.int32))
    ref = enc.init(jax.random.key(0), ids, None, train=False)["params"]

    # structures align leaf-for-leaf
    ref_flat = jax.tree_util.tree_flatten_with_path(ref)[0]
    got_flat = jax.tree_util.tree_flatten_with_path(
        jax.tree_util.tree_map(jnp.asarray, params)
    )[0]
    ref_paths = {jax.tree_util.keystr(p): v.shape for p, v in ref_flat}
    got_paths = {jax.tree_util.keystr(p): v.shape for p, v in got_flat}
    assert ref_paths == got_paths

    # converted params run a forward pass
    out = enc.apply({"params": params}, ids, None, train=False)
    assert np.isfinite(np.asarray(out)).all()
    assert out.shape == (2, 8, hidden)


def test_hf_conversion_matches_torch_attention(rng):
    """One attention layer: flax with converted weights == torch math."""
    torch = pytest.importorskip("torch")
    hidden, heads = 16, 4
    sd = fabricate_hf_state_dict(rng, hidden=hidden, layers=1)
    params = convert_hf_state_dict(sd, num_layers=1, heads=heads)

    x = rng.normal(size=(1, 6, hidden)).astype(np.float32)

    # torch reference: standard multi-head self-attention with HF weights
    q = x @ sd["encoder.layer.0.attention.self.query.weight"].T + sd["encoder.layer.0.attention.self.query.bias"]
    k = x @ sd["encoder.layer.0.attention.self.key.weight"].T + sd["encoder.layer.0.attention.self.key.bias"]
    v = x @ sd["encoder.layer.0.attention.self.value.weight"].T + sd["encoder.layer.0.attention.self.value.bias"]
    hd = hidden // heads
    qh = q.reshape(1, 6, heads, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(1, 6, heads, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(1, 6, heads, hd).transpose(0, 2, 1, 3)
    att = torch.softmax(torch.tensor(qh @ kh.transpose(0, 1, 3, 2) / np.sqrt(hd)), dim=-1).numpy()
    ctx = (att @ vh).transpose(0, 2, 1, 3).reshape(1, 6, hidden)
    want = ctx @ sd["encoder.layer.0.attention.output.dense.weight"].T + sd["encoder.layer.0.attention.output.dense.bias"]

    import flax.linen as nn

    mha = nn.MultiHeadDotProductAttention(
        num_heads=heads, qkv_features=hidden, deterministic=True, name="attention"
    )
    got = mha.apply(
        {"params": params["layer_0"]["attention"]},
        jnp.asarray(x), jnp.asarray(x), jnp.asarray(x),
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)


def test_torch_checkpoint_loader(tmp_path, rng):
    torch = pytest.importorskip("torch")
    from eda_tpu.train.checkpoint import load_torch_checkpoint

    sd = {
        "module.backbone_net.sa1.w0": torch.tensor(rng.normal(size=(4, 8)).astype(np.float32)),
        "head.bias": torch.tensor(np.zeros(3, np.float32)),
    }
    path = str(tmp_path / "ckpt.pth")
    torch.save({"model": sd, "epoch": 7}, path)
    out = load_torch_checkpoint(path)
    assert "backbone_net.sa1.w0" in out  # DDP prefix stripped
    assert out["backbone_net.sa1.w0"].shape == (4, 8)
    assert out["head.bias"].shape == (3,)
