"""RoBERTa-architecture text encoder in Flax.

The reference loads HF ``RobertaModel`` from a local folder and freezes it
(``models/bdetr.py:72-80``). This module reimplements the same architecture
(learned word + position embeddings, post-LN transformer blocks, GELU FFN)
natively in Flax so the whole grounder is one XLA graph, and provides a
weight converter from a HF PyTorch checkpoint when one is available on disk
(offline environments train it from scratch or load converted weights).

Frozen-ness is handled at the optimizer level (zero learning rate for the
``text_encoder`` subtree — see ``eda_tpu.train.optim``), mirroring how the
reference freezes parameters but keeps them in the module tree.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

LAYER_NORM_EPS = 1e-5  # roberta-base config
PAD_TOKEN_ID = 1  # roberta position ids start after padding_idx


class RobertaEmbeddings(nn.Module):
    vocab_size: int
    hidden: int
    max_len: int = 514
    dropout: float = 0.1

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        word = nn.Embed(self.vocab_size, self.hidden, name="word_embeddings")(input_ids)
        # Roberta position ids: pad_id + 1 + cumulative index of non-pad tokens;
        # we use the simpler absolute scheme offset by pad_id + 1, which matches
        # HF for left-aligned (non-shifted) batches.
        positions = jnp.arange(input_ids.shape[1])[None, :] + PAD_TOKEN_ID + 1
        pos = nn.Embed(self.max_len, self.hidden, name="position_embeddings")(positions)
        h = word + pos
        h = nn.LayerNorm(epsilon=LAYER_NORM_EPS, name="layer_norm")(h)
        return nn.Dropout(self.dropout, deterministic=not train)(h)


class RobertaLayer(nn.Module):
    hidden: int
    heads: int
    intermediate: int
    dropout: float = 0.1
    fused_qkv: bool = False

    @nn.compact
    def __call__(self, h: jnp.ndarray, valid: jnp.ndarray, *, train: bool):
        mask = jnp.broadcast_to(
            valid[:, None, None, :], (h.shape[0], 1, h.shape[1], h.shape[1])
        )
        if self.fused_qkv:
            # q = k = v = h -> one (hidden, 3*hidden) projection; the param
            # tree matches the flax module below (see layers._FusedMHACore).
            from eda_tpu.models.layers import _FusedMHACore

            a = _FusedMHACore(
                self.hidden, self.heads, self.dropout, name="attention"
            )(h, h, h, mask, deterministic=not train)
        else:
            a = nn.MultiHeadDotProductAttention(
                num_heads=self.heads,
                qkv_features=self.hidden,
                dropout_rate=self.dropout,
                deterministic=not train,
                name="attention",
            )(h, h, h, mask=mask)
        a = nn.Dropout(self.dropout, deterministic=not train)(a)
        h = nn.LayerNorm(epsilon=LAYER_NORM_EPS, name="attention_norm")(h + a)
        f = nn.Dense(self.intermediate, name="intermediate")(h)
        f = nn.gelu(f, approximate=False)
        f = nn.Dense(self.hidden, name="output")(f)
        f = nn.Dropout(self.dropout, deterministic=not train)(f)
        return nn.LayerNorm(epsilon=LAYER_NORM_EPS, name="output_norm")(h + f)


class RobertaEncoder(nn.Module):
    """Returns the last hidden state (B, L, hidden)."""

    vocab_size: int = 50265
    hidden: int = 768
    num_layers: int = 12
    heads: int = 12
    intermediate: int = 3072
    dropout: float = 0.1
    fused_qkv: bool = False

    @nn.compact
    def __call__(
        self, input_ids: jnp.ndarray, valid: Optional[jnp.ndarray], *, train: bool
    ) -> jnp.ndarray:
        if valid is None:
            valid = jnp.ones_like(input_ids, dtype=bool)
        h = RobertaEmbeddings(
            self.vocab_size, self.hidden, dropout=self.dropout, name="embeddings"
        )(input_ids, train=train)
        for i in range(self.num_layers):
            h = RobertaLayer(
                self.hidden,
                self.heads,
                self.intermediate,
                self.dropout,
                self.fused_qkv,
                name=f"layer_{i}",
            )(h, valid, train=train)
        return h


def convert_hf_state_dict(state_dict: dict, num_layers: int, heads: int) -> dict:
    """Map a HF PyTorch ``roberta-base`` state dict onto this module's params.

    Accepts a dict of numpy arrays keyed by HF names (``roberta.`` prefixes
    stripped). Returns a nested Flax params dict for ``RobertaEncoder``.
    Flax attention kernels are (features, heads, head_dim) and the output
    projection is (heads, head_dim, features), hence the reshapes.
    """
    import numpy as np

    def lin(prefix):
        return {
            "kernel": np.asarray(state_dict[prefix + ".weight"]).T,
            "bias": np.asarray(state_dict[prefix + ".bias"]),
        }

    def ln(prefix):
        return {
            "scale": np.asarray(state_dict[prefix + ".weight"]),
            "bias": np.asarray(state_dict[prefix + ".bias"]),
        }

    # HF adds token_type_embeddings[token_type_ids] before the embedding
    # LayerNorm; the grounder only ever encodes single-segment text
    # (token_type 0 everywhere, like the reference's tokenizer call at
    # bdetr.py:170-172), so that row is a constant offset — fold it into the
    # position table instead of carrying a dead lookup in the XLA graph.
    pos_table = np.asarray(state_dict["embeddings.position_embeddings.weight"])
    tok_type = state_dict.get("embeddings.token_type_embeddings.weight")
    if tok_type is not None:
        pos_table = pos_table + np.asarray(tok_type)[0]
    params = {
        "embeddings": {
            "word_embeddings": {
                "embedding": np.asarray(state_dict["embeddings.word_embeddings.weight"])
            },
            "position_embeddings": {"embedding": pos_table},
            "layer_norm": ln("embeddings.LayerNorm"),
        }
    }
    for i in range(num_layers):
        p = f"encoder.layer.{i}"
        hidden = np.asarray(state_dict[f"{p}.attention.self.query.weight"]).shape[0]
        head_dim = hidden // heads

        def attn_proj(name):
            w = np.asarray(state_dict[f"{p}.attention.self.{name}.weight"]).T
            b = np.asarray(state_dict[f"{p}.attention.self.{name}.bias"])
            return {
                "kernel": w.reshape(hidden, heads, head_dim),
                "bias": b.reshape(heads, head_dim),
            }

        out_w = np.asarray(state_dict[f"{p}.attention.output.dense.weight"]).T
        params[f"layer_{i}"] = {
            "attention": {
                "query": attn_proj("query"),
                "key": attn_proj("key"),
                "value": attn_proj("value"),
                "out": {
                    "kernel": out_w.reshape(heads, head_dim, hidden),
                    "bias": np.asarray(state_dict[f"{p}.attention.output.dense.bias"]),
                },
            },
            "attention_norm": ln(f"{p}.attention.output.LayerNorm"),
            "intermediate": lin(f"{p}.intermediate.dense"),
            "output": lin(f"{p}.output.dense"),
            "output_norm": ln(f"{p}.output.LayerNorm"),
        }
    return params
