"""EDAGrounder: the full 3D visual-grounding model as one Flax module.

TPU-native re-design of ``BeaUTyDETR`` (reference ``models/bdetr.py:28-345``):
PointNet++ backbone and RoBERTa text encoder feed a 3-layer bidirectional
cross-modal encoder; 256 queries are selected by seed objectness (KPS); a
proposal head plus 6 decoder layers each emit center/size/soft-token
predictions and 64-d contrastive projections. Everything — including text
encoding — traces into a single jitted XLA graph with static shapes.

The returned ``end_points`` dict keeps the reference's key naming
(``proposal_``/``{i}head_``/``last_`` prefixes, ``seeds_obj_cls_logits``,
``fp2_*``, ...) because losses, evaluators, and logging key off it
(``models/losses.py:650-739``, ``src/grounding_evaluator.py``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from eda_tpu.config import ModelConfig
from eda_tpu.models.layers import (
    BiDecoderLayer,
    BiEncoderLayer,
    ClsAgnosticPredictHead,
    ContrastiveProjection,
    PointsObjClsModule,
    PositionEmbeddingLearned,
)
from eda_tpu.models.pointnet2 import PointNetPPBackbone
from eda_tpu.models.roberta import RobertaEncoder


class EDAGrounder(nn.Module):
    """3D language grounder. See module docstring.

    Inputs dict (all fixed-shape arrays):
        point_clouds: (B, N, 3 + input_feature_dim) float
        text_ids: (B, L) int32 token ids
        text_mask: (B, L) bool, True = real token
        det_boxes: (B, D, 6) cxcyczwhd   (butd only)
        det_class_ids: (B, D) int32      (butd only)
        det_mask: (B, D) bool, True = valid box (butd only)
    """

    cfg: ModelConfig
    freeze_text_encoder: bool = True

    @nn.compact
    def __call__(self, inputs: dict, *, train: bool) -> dict:
        cfg = self.cfg
        dtype = jnp.bfloat16 if cfg.use_bf16 else jnp.float32

        # ---- STEP 1a. visual backbone (bdetr.py:161-167) ----
        end_points = PointNetPPBackbone(
            npoints=tuple(cfg.sa_npoints),
            radii=tuple(cfg.sa_radii),
            nsamples=tuple(cfg.sa_nsamples),
            mlps=tuple(tuple(m) for m in cfg.sa_mlps),
            fp_mlps=tuple(tuple(m) for m in cfg.fp_mlps),
            sa_impl=cfg.sa_impl,
            sa_ball_mode=cfg.sa_ball_mode,
            sa_windows=tuple(cfg.sa_windows),
            points_presorted=cfg.points_presorted,
            dtype=dtype,
            name="backbone_net",
        )(inputs["point_clouds"], train=train)
        end_points["seed_inds"] = end_points["fp2_inds"]
        end_points["seed_xyz"] = end_points["fp2_xyz"]

        points_xyz = end_points["fp2_xyz"]  # (B, K, 3)
        points_features = end_points["fp2_features"]  # (B, K, d)

        # ---- STEP 1b. text encoder (bdetr.py:169-183) ----
        text_valid = inputs["text_mask"]
        encoded_text = RobertaEncoder(
            vocab_size=cfg.text_vocab_size,
            hidden=cfg.text_hidden,
            num_layers=cfg.text_layers,
            heads=cfg.text_heads,
            intermediate=cfg.text_intermediate,
            fused_qkv=cfg.fused_qkv,
            name="text_encoder",
        )(inputs["text_ids"], text_valid, train=train and not self.freeze_text_encoder)
        if self.freeze_text_encoder:
            encoded_text = jax.lax.stop_gradient(encoded_text)
        text_feats = nn.Dense(cfg.d_model, name="text_projector_dense")(encoded_text)
        text_feats = nn.LayerNorm(epsilon=1e-12, name="text_projector_norm")(text_feats)
        text_feats = nn.Dropout(cfg.dropout, deterministic=not train)(text_feats)
        end_points["text_feats_prepro"] = text_feats

        # ---- STEP 2. detected-box stream (bdetr.py:231-242) ----
        detected_feats = None
        detected_valid = None
        if cfg.butd:
            detected_valid = inputs["det_mask"]
            box_emb = PositionEmbeddingLearned(
                cfg.butd_box_dim, dtype, name="box_embeddings"
            )(inputs["det_boxes"], train=train)  # (B, D, butd_box_dim)
            # the table is generated OFFLINE by RoBERTa-base and is always
            # 768-wide regardless of the runtime text encoder
            # (bdetr.py:90 hardcodes nn.Embedding(num_obj_class, 768))
            cls_table = nn.Embed(
                cfg.num_obj_class,
                cfg.butd_class_embed_dim,
                name="butd_class_embeddings",
            )(inputs["det_class_ids"])
            cls_table = jax.lax.stop_gradient(cls_table)  # frozen table (bdetr.py:95)
            cls_emb = nn.Dense(
                cfg.d_model - cfg.butd_box_dim, name="class_embeddings"
            )(cls_table)
            detected_feats = jnp.concatenate([box_emb, cls_emb], axis=-1)

        # ---- STEP 3. cross-modal encoder (bdetr.py:247-263) ----
        pos_feats = PositionEmbeddingLearned(cfg.d_model, dtype, name="pos_embed")(
            points_xyz, train=train
        )
        vis_valid = None  # all 1024 seeds are real (bdetr.py:251-253)
        for i in range(cfg.num_encoder_layers):
            points_features, text_feats = BiEncoderLayer(
                cfg.d_model,
                n_heads=cfg.n_heads,
                dim_feedforward=cfg.dim_feedforward,
                dropout=cfg.dropout,
                self_attend=cfg.self_attend,
                use_butd_enc_attn=cfg.butd,
                dtype=dtype,
                fused_qkv=cfg.fused_qkv,
                name=f"cross_encoder_{i}",
            )(
                points_features,
                pos_feats,
                vis_valid,
                text_feats,
                text_valid,
                detected_feats,
                detected_valid,
                train=train,
            )
        end_points["text_memory"] = text_feats
        end_points["seed_features"] = points_features

        # ---- STEP 4. contrastive text projection (bdetr.py:266-270) ----
        if cfg.contrastive_align:
            proj_text = ContrastiveProjection(
                cfg.d_model, cfg.contrastive_dim, dtype, name="contrastive_proj_text"
            )
            proj_image = ContrastiveProjection(
                cfg.d_model, cfg.contrastive_dim, dtype, name="contrastive_proj_image"
            )
            end_points["proj_tokens"] = proj_text(text_feats)

        # ---- STEP 5. query selection: KPS top-k (bdetr.py:187-205) ----
        seeds_obj_cls_logits = PointsObjClsModule(
            cfg.d_model, dtype, name="points_obj_cls"
        )(points_features, train=train)
        end_points["seeds_obj_cls_logits"] = seeds_obj_cls_logits  # (B, K)
        _, sample_inds = jax.lax.top_k(seeds_obj_cls_logits, cfg.num_queries)
        sample_inds = sample_inds.astype(jnp.int32)
        cluster_xyz = jnp.take_along_axis(points_xyz, sample_inds[..., None], axis=1)
        cluster_feature = jnp.take_along_axis(
            points_features, sample_inds[..., None], axis=1
        )
        end_points["query_points_xyz"] = cluster_xyz
        end_points["query_points_feature"] = cluster_feature
        end_points["query_points_sample_inds"] = sample_inds

        query = nn.Dense(cfg.d_model, name="decoder_query_proj")(cluster_feature)
        if cfg.contrastive_align:
            end_points["proposal_proj_queries"] = proj_image(query)

        # ---- STEP 6. proposal head (bdetr.py:287-295) ----
        center, size, sem_cls = ClsAgnosticPredictHead(
            cfg.num_class, cfg.d_model, dtype, name="proposal_head"
        )(cluster_feature, cluster_xyz, train=train)
        end_points["proposal_base_xyz"] = cluster_xyz
        end_points["proposal_center"] = center
        end_points["proposal_pred_size"] = size
        end_points["proposal_sem_cls_scores"] = sem_cls
        base_xyz = jax.lax.stop_gradient(center)
        base_size = jax.lax.stop_gradient(size)

        # ---- STEP 7. decoder (bdetr.py:298-337) ----
        for i in range(cfg.num_decoder_layers):
            prefix = (
                "last_" if i == cfg.num_decoder_layers - 1 else f"{i}head_"
            )
            if cfg.self_position_embedding == "none":
                query_loc = jnp.zeros_like(base_xyz)
            elif cfg.self_position_embedding == "xyz_learned":
                query_loc = base_xyz
            else:  # loc_learned
                query_loc = jnp.concatenate([base_xyz, base_size], axis=-1)

            query = BiDecoderLayer(
                cfg.d_model,
                n_heads=cfg.n_heads,
                dim_feedforward=cfg.dim_feedforward,
                dropout=cfg.dropout,
                self_position_embedding=cfg.self_position_embedding,
                butd=cfg.butd,
                dtype=dtype,
                fused_qkv=cfg.fused_qkv,
                name=f"decoder_{i}",
            )(
                query,
                points_features,
                text_feats,
                query_loc,
                text_valid,
                detected_feats,
                detected_valid,
                train=train,
            )
            if cfg.contrastive_align:
                end_points[f"{prefix}proj_queries"] = proj_image(query)

            center, size, sem_cls = ClsAgnosticPredictHead(
                cfg.num_class, cfg.d_model, dtype, name=f"prediction_head_{i}"
            )(query, cluster_xyz, train=train)
            end_points[f"{prefix}base_xyz"] = cluster_xyz
            end_points[f"{prefix}center"] = center
            end_points[f"{prefix}pred_size"] = size
            end_points[f"{prefix}sem_cls_scores"] = sem_cls
            base_xyz = jax.lax.stop_gradient(center)
            base_size = jax.lax.stop_gradient(size)

        return end_points


def decoder_prefixes(num_decoder_layers: int) -> list:
    """['proposal_', 'last_', '0head_', ..] (reference losses.py:653-654)."""
    return ["proposal_", "last_"] + [f"{i}head_" for i in range(num_decoder_layers - 1)]
