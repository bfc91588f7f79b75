"""Cross-modal transformer layers, position embeddings, prediction heads.

Flax re-implementations of the reference modules:

* ``PositionEmbeddingLearned``       — ``models/encoder_decoder_layers.py:19-34``
* ``BiEncoderLayer`` / ``BiEncoder`` — ``models/encoder_decoder_layers.py:189-285``
* ``CrossAttentionLayer``            — ``models/encoder_decoder_layers.py:37-124``
* ``BiDecoderLayer``                 — ``models/encoder_decoder_layers.py:288-407``
* ``PointsObjClsModule``             — ``models/modules.py:19-49``
* ``ThreeLayerMLP`` / ``ClsAgnosticPredictHead`` — ``models/modules.py:89-178``

Conventions (all different from the torch reference, all deliberate):

* batch-first ``(B, L, F)`` throughout — no (L, B, F) transposes;
* masks are *validity* masks: True = real token. Torch's key_padding_mask
  (True = ignore) and HF's attention_mask (1 = attend) both map onto this;
* post-norm residual blocks, matching torch ``nn.MultiheadAttention`` usage
  in the reference.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from eda_tpu.models.pointnet2 import BN_MOMENTUM


def _attn_mask(valid: Optional[jnp.ndarray], q_len: int) -> Optional[jnp.ndarray]:
    """(B, Lk) validity -> (B, 1, Lq, Lk) attention mask for flax MHA."""
    if valid is None:
        return None
    return jnp.broadcast_to(
        valid[:, None, None, :], (valid.shape[0], 1, q_len, valid.shape[1])
    )


class _ProjParams(nn.Module):
    """Parameter container matching ``nn.DenseGeneral``'s tree and init.

    Declares ``kernel``/``bias`` with the exact shapes and initializer
    semantics of the DenseGeneral that ``nn.MultiHeadDotProductAttention``
    would create (lecun_normal drawn on the *flattened* 2-D shape, then
    reshaped — flax's ``kernel_init_wrap``), so a checkpoint written by the
    unfused path loads bit-identically into the fused one and vice versa.
    """

    in_dim: int
    heads: int
    head_dim: int
    out: bool = False  # out projection: kernel (h, dh, d), bias (d,)

    @nn.compact
    def __call__(self):
        if self.out:
            kshape = (self.heads, self.head_dim, self.in_dim)
            flat = (self.heads * self.head_dim, self.in_dim)
            bshape = (self.in_dim,)
        else:
            kshape = (self.in_dim, self.heads, self.head_dim)
            flat = (self.in_dim, self.heads * self.head_dim)
            bshape = (self.heads, self.head_dim)
        lecun = nn.initializers.lecun_normal()

        def kinit(rng, shape, dtype=jnp.float32):
            return jnp.reshape(lecun(rng, flat, dtype), shape)

        kernel = self.param("kernel", kinit, kshape)
        bias = self.param("bias", nn.initializers.zeros_init(), bshape)
        return kernel, bias


class _FusedMHACore(nn.Module):
    """QKV-fused multi-head attention with flax-MHA-compatible params.

    Semantics match ``nn.MultiHeadDotProductAttention`` exactly (same
    projections, same ``nn.dot_product_attention`` core, same out
    projection); the only difference is that projections whose *inputs are
    the same array* are computed as one wide matmul:

    * ``q is k is v``  -> one (d, 3·d) projection (language self-attention)
    * ``q is k``       -> (d, 2·d) for q,k + separate v (vision/query
                          self-attention, where q = k = x + pos)
    * ``k is v``       -> separate q + (d, 2·d) for k,v (all cross-attention)

    XLA does not merge these dots on its own (they are separate HLO dots
    with distinct weight operands); fusing them trims the number of small
    (288-wide) MXU launches in the 3-encoder/6-decoder stack by ~1/3.
    """

    d_model: int
    n_heads: int
    dropout: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, mask, *, deterministic: bool):
        d, h = self.d_model, self.n_heads
        dh = d // h
        dt = self.dtype
        # Declare in flax MHA order (query, key, value, out) with the same
        # child names -> identical param tree AND identical init draws.
        wq, bq = _ProjParams(q.shape[-1], h, dh, name="query")()
        wk, bk = _ProjParams(k.shape[-1], h, dh, name="key")()
        wv, bv = _ProjParams(v.shape[-1], h, dh, name="value")()
        wo, bo = _ProjParams(d, h, dh, out=True, name="out")()
        wq2, wk2, wv2 = (w.reshape(w.shape[0], h * dh) for w in (wq, wk, wv))
        bq1, bk1, bv1 = (b.reshape(h * dh) for b in (bq, bk, bv))

        def proj(x, w, b):
            y = x.astype(dt) @ w.astype(dt) + b.astype(dt)
            return y.reshape(*x.shape[:-1], -1, h, dh)

        if q is k and k is v:
            w = jnp.concatenate([wq2, wk2, wv2], axis=1)
            b = jnp.concatenate([bq1, bk1, bv1])
            qh, kh, vh = jnp.moveaxis(proj(q, w, b), -3, 0)
        elif q is k:
            w = jnp.concatenate([wq2, wk2], axis=1)
            b = jnp.concatenate([bq1, bk1])
            qh, kh = jnp.moveaxis(proj(q, w, b), -3, 0)
            (vh,) = jnp.moveaxis(proj(v, wv2, bv1), -3, 0)
        elif k is v:
            (qh,) = jnp.moveaxis(proj(q, wq2, bq1), -3, 0)
            w = jnp.concatenate([wk2, wv2], axis=1)
            b = jnp.concatenate([bk1, bv1])
            kh, vh = jnp.moveaxis(proj(k, w, b), -3, 0)
        else:
            (qh,) = jnp.moveaxis(proj(q, wq2, bq1), -3, 0)
            (kh,) = jnp.moveaxis(proj(k, wk2, bk1), -3, 0)
            (vh,) = jnp.moveaxis(proj(v, wv2, bv1), -3, 0)

        dropout_rng = None
        if self.dropout > 0.0 and not deterministic:
            dropout_rng = self.make_rng("dropout")
        x = nn.dot_product_attention(
            qh,
            kh,
            vh,
            mask=mask,
            dropout_rng=dropout_rng,
            dropout_rate=self.dropout,
            broadcast_dropout=True,
            deterministic=deterministic,
            dtype=dt,
        )
        x = x.reshape(*x.shape[:-2], h * dh)
        return x @ wo.reshape(h * dh, d).astype(dt) + bo.astype(dt)


class MHA(nn.Module):
    """Multi-head attention with separate q/kv and a validity mask."""

    d_model: int
    n_heads: int
    dropout: float
    dtype: jnp.dtype = jnp.float32
    fuse: bool = False

    @nn.compact
    def __call__(self, q, k, v, valid: Optional[jnp.ndarray], *, train: bool):
        mask = _attn_mask(valid, q.shape[1])
        if self.fuse:
            # Same param tree/init as the flax module below (the core is
            # named to shadow flax's auto-assigned child name).
            return _FusedMHACore(
                self.d_model,
                self.n_heads,
                self.dropout,
                self.dtype,
                name="MultiHeadDotProductAttention_0",
            )(q, k, v, mask, deterministic=not train)
        return nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads,
            qkv_features=self.d_model,
            out_features=self.d_model,
            dropout_rate=self.dropout,
            deterministic=not train,
            dtype=self.dtype,
        )(q, k, v, mask=mask)


class ResidualAttn(nn.Module):
    """x + dropout(attn) -> LayerNorm, the post-norm block used everywhere.

    ``k=None`` means "the keys are the queries" (self-attention where both
    sides carry the position embedding): k is then *the same array object*
    as q, which lets the fused MHA compute the q and k projections as one
    matmul.
    """

    d_model: int
    n_heads: int
    dropout: float
    dtype: jnp.dtype = jnp.float32
    fuse: bool = False

    @nn.compact
    def __call__(self, x, k, v, valid, *, train: bool, q_pos=None):
        q = x if q_pos is None else x + q_pos
        if k is None:
            k = q
        if v is None:
            v = k
        a = MHA(self.d_model, self.n_heads, self.dropout, self.dtype, self.fuse)(
            q, k, v, valid, train=train
        )
        a = nn.Dropout(self.dropout, deterministic=not train)(a)
        return nn.LayerNorm(dtype=jnp.float32)(x + a)


class FFN(nn.Module):
    """x + MLP(x) -> LayerNorm (reference ffn blocks, dim_feedforward=256)."""

    d_model: int
    dim_feedforward: int
    dropout: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        h = nn.Dense(self.dim_feedforward, dtype=self.dtype)(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(self.d_model, dtype=self.dtype)(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return nn.LayerNorm(dtype=jnp.float32)(x + h)


class PositionEmbeddingLearned(nn.Module):
    """Dense + BN + ReLU + Dense over xyz (3) or box (6) coordinates."""

    num_pos_feats: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, coords: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        h = nn.Dense(self.num_pos_feats, dtype=self.dtype)(coords.astype(self.dtype))
        h = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, dtype=jnp.float32
        )(h)
        h = nn.relu(h)
        return nn.Dense(self.num_pos_feats, dtype=self.dtype)(h)


class BiEncoderLayer(nn.Module):
    """Self-attention per modality, then bidirectional cross-attention.

    Order matches ``encoder_decoder_layers.py:225-255``: vision self-attn
    (pos added to q and k), language self-attn (no FFN), then the cross block:
    lang->vis attn + FFN, vis->lang attn, optional vis->detected-boxes attn,
    vis FFN.
    """

    d_model: int
    n_heads: int = 8
    dim_feedforward: int = 256
    dropout: float = 0.1
    self_attend: bool = True
    use_butd_enc_attn: bool = False
    dtype: jnp.dtype = jnp.float32
    fused_qkv: bool = False

    @nn.compact
    def __call__(
        self,
        vis_feats: jnp.ndarray,
        pos_feats: jnp.ndarray,
        vis_valid: Optional[jnp.ndarray],
        text_feats: jnp.ndarray,
        text_valid: Optional[jnp.ndarray],
        detected_feats: Optional[jnp.ndarray] = None,
        detected_valid: Optional[jnp.ndarray] = None,
        *,
        train: bool,
    ):
        d, h, p, dt = self.d_model, self.n_heads, self.dropout, self.dtype
        fu = self.fused_qkv
        if self.self_attend:
            vis_feats = ResidualAttn(d, h, p, dt, fu, name="self_vis")(
                vis_feats, None, vis_feats, vis_valid, train=train, q_pos=pos_feats
            )
            text_feats = ResidualAttn(d, h, p, dt, fu, name="self_lang")(
                text_feats, text_feats, text_feats, text_valid, train=train
            )

        # Cross block. BOTH directions read the other modality's PRE-cross
        # features: the reference captures qv/kv/vv and qt/kt/vt at
        # CrossAttentionLayer entry (encoder_decoder_layers.py:78-84), so
        # vision attends to the language features from BEFORE the lang->vis
        # update — not the ffn_lv output. (Caught by the differential parity
        # test against the actual reference module.)
        text_kv = text_feats
        text_feats = ResidualAttn(d, h, p, dt, fu, name="cross_lv")(
            text_feats, vis_feats, vis_feats, vis_valid, train=train
        )
        text_feats = FFN(d, self.dim_feedforward, p, dt, name="ffn_lv")(
            text_feats, train=train
        )
        # Vision attends to language (query gets pos embedding).
        vis_feats = ResidualAttn(d, h, p, dt, fu, name="cross_vl")(
            vis_feats, text_kv, text_kv, text_valid, train=train, q_pos=pos_feats
        )
        # Optional detected-box stream (butd).
        if self.use_butd_enc_attn and detected_feats is not None:
            vis_feats = ResidualAttn(d, h, p, dt, fu, name="cross_d")(
                vis_feats, detected_feats, detected_feats, detected_valid, train=train
            )
        vis_feats = FFN(d, self.dim_feedforward, p, dt, name="ffn_vl")(
            vis_feats, train=train
        )
        return vis_feats, text_feats


class BiDecoderLayer(nn.Module):
    """Query self-attn -> cross(text) -> cross(boxes, butd) -> cross(vision) -> FFN.

    Reference ``encoder_decoder_layers.py:288-407``; the learned position
    embedding of the query location (xyz or xyz+size) is added to q (and k for
    self-attention) at every attention call.
    """

    d_model: int
    n_heads: int = 8
    dim_feedforward: int = 256
    dropout: float = 0.1
    self_position_embedding: str = "loc_learned"
    butd: bool = False
    dtype: jnp.dtype = jnp.float32
    fused_qkv: bool = False

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,
        vis_feats: jnp.ndarray,
        text_feats: jnp.ndarray,
        query_loc: jnp.ndarray,
        text_valid: Optional[jnp.ndarray],
        detected_feats: Optional[jnp.ndarray] = None,
        detected_valid: Optional[jnp.ndarray] = None,
        *,
        train: bool,
    ) -> jnp.ndarray:
        d, h, p, dt = self.d_model, self.n_heads, self.dropout, self.dtype
        fu = self.fused_qkv
        if self.self_position_embedding == "none":
            q_pos = None
        else:
            q_pos = PositionEmbeddingLearned(d, dt, name="self_posembed")(
                query_loc, train=train
            )

        query = ResidualAttn(d, h, p, dt, fu, name="self_attn")(
            query, None, query, None, train=train, q_pos=q_pos
        )
        query = ResidualAttn(d, h, p, dt, fu, name="cross_l")(
            query, text_feats, text_feats, text_valid, train=train, q_pos=q_pos
        )
        if self.butd and detected_feats is not None:
            query = ResidualAttn(d, h, p, dt, fu, name="cross_d")(
                query, detected_feats, detected_feats, detected_valid, train=train,
                q_pos=q_pos,
            )
        query = ResidualAttn(d, h, p, dt, fu, name="cross_v")(
            query, vis_feats, vis_feats, None, train=train, q_pos=q_pos
        )
        return FFN(d, self.dim_feedforward, p, dt, name="ffn")(query, train=train)


class PointsObjClsModule(nn.Module):
    """Seed objectness head: Dense+BN+ReLU x2 + Dense(1) (``modules.py:19-49``)."""

    d_model: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, seed_features: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        h = seed_features.astype(self.dtype)
        for _ in range(2):
            h = nn.Dense(self.d_model, dtype=self.dtype)(h)
            h = nn.BatchNorm(
                use_running_average=not train, momentum=BN_MOMENTUM, dtype=jnp.float32
            )(h)
            h = nn.relu(h)
        return nn.Dense(1, dtype=jnp.float32)(h)[..., 0]  # (B, K)


class ThreeLayerMLP(nn.Module):
    """Dense(no bias)+BN+ReLU+Dropout(0.3) x2 + Dense(out) (``modules.py:89-108``)."""

    dim: int
    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        h = x.astype(self.dtype)
        for _ in range(2):
            h = nn.Dense(self.dim, use_bias=False, dtype=self.dtype)(h)
            h = nn.BatchNorm(
                use_running_average=not train, momentum=BN_MOMENTUM, dtype=jnp.float32
            )(h)
            h = nn.relu(h)
            h = nn.Dropout(0.3, deterministic=not train)(h)
        return nn.Dense(self.out_dim, dtype=jnp.float32)(h)


class ClsAgnosticPredictHead(nn.Module):
    """Center-residual, size, and soft-token class heads (``modules.py:111-178``).

    Returns (center, size, sem_cls_scores):
        center = base_xyz + center_residual      (B, Q, 3)
        size                                      (B, Q, 3)
        sem_cls_scores over num_class token slots (B, Q, num_class)
    """

    num_class: int
    d_model: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: jnp.ndarray, base_xyz: jnp.ndarray, *, train: bool):
        center_residual = ThreeLayerMLP(self.d_model, 3, self.dtype, name="center_head")(
            features, train=train
        )
        pred_size = ThreeLayerMLP(self.d_model, 3, self.dtype, name="size_head")(
            features, train=train
        )
        sem_cls = ThreeLayerMLP(
            self.d_model, self.num_class, self.dtype, name="sem_cls_head"
        )(features, train=train)
        return base_xyz + center_residual, pred_size, sem_cls


class ContrastiveProjection(nn.Module):
    """3-layer MLP to the shared 64-d space, L2-normalized (``bdetr.py:140-154``)."""

    d_model: int
    out_dim: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = x.astype(self.dtype)
        h = nn.relu(nn.Dense(self.d_model, dtype=self.dtype)(h))
        h = nn.relu(nn.Dense(self.d_model, dtype=self.dtype)(h))
        h = nn.Dense(self.out_dim, dtype=jnp.float32)(h)
        return h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-12)
