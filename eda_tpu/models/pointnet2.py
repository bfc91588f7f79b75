"""PointNet++ backbone in Flax (channels-last, single XLA graph).

Re-designs the reference stack
``pointnet2/pointnet2_modules.py`` + ``models/backbone_module.py`` for TPU:

* channels-last everywhere — the feature axis rides TPU lanes, and the
  1x1 Conv2d towers of the reference become plain ``nn.Dense`` applied to
  ``(B, M, nsample, C)`` neighborhoods (pure MXU matmuls that XLA fuses with
  the BN+ReLU epilogues);
* sampling/grouping are the functional ops from ``eda_tpu.ops`` (Pallas FPS
  on TPU, jnp fallback elsewhere), so the whole backbone traces into one
  jitted graph with static shapes;
* BatchNorm statistics are global across the data-parallel batch for free:
  under pjit the batch axis is sharded but the graph is global, so XLA
  inserts the cross-replica reductions the reference needed SyncBatchNorm
  for (``main_utils.py:336-338``).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from eda_tpu.ops import pointops

# Flax BatchNorm momentum 0.9 == torch momentum 0.1 (models/bdetr.py:341-345).
BN_MOMENTUM = 0.9


class SharedMLP(nn.Module):
    """Dense + BatchNorm + ReLU tower over the trailing feature axis.

    Equivalent of ``pytorch_utils.SharedMLP`` (1x1 Conv2d + BN2d + ReLU): a
    1x1 conv over (B, C, M, ns) is exactly a Dense over channels-last input.
    """

    channels: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        for ch in self.channels:
            x = nn.Dense(ch, use_bias=False, dtype=self.dtype)(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=BN_MOMENTUM, dtype=jnp.float32
            )(x)
            x = nn.relu(x)
        return x


class SetAbstraction(nn.Module):
    """Single-scale grouping SA layer (``PointnetSAModuleVotes``).

    FPS -> ball query -> relative-xyz grouping (normalized by radius) ->
    shared MLP -> max pool over the neighborhood
    (reference ``pointnet2/pointnet2_modules.py:210-272`` with
    use_xyz=True, normalize_xyz=True as in ``backbone_module.py:44-78``).
    """

    npoint: int
    radius: float
    nsample: int
    mlp_channels: Sequence[int]
    ball_mode: str = "nearest"  # nearest | first (reference-exact order)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        xyz: jnp.ndarray,
        features: Optional[jnp.ndarray],
        *,
        train: bool,
    ):
        """xyz (B, N, 3); features (B, N, C) or None.

        Returns (new_xyz (B, M, 3), new_features (B, M, C'), inds (B, M)).
        """
        inds = pointops.furthest_point_sample(xyz, self.npoint)
        new_xyz = pointops.gather_points(xyz, inds)
        if self.ball_mode == "first":
            nbr = pointops.ball_query(xyz, new_xyz, self.radius, self.nsample)
        elif self.ball_mode == "nearest":
            nbr = pointops.ball_query_nearest(
                xyz, new_xyz, self.radius, self.nsample
            )
        else:
            raise ValueError(f"unknown ball_mode {self.ball_mode!r}")
        grouped_xyz = pointops.group_points(xyz, nbr) - new_xyz[:, :, None, :]
        grouped_xyz = grouped_xyz / self.radius  # normalize_xyz
        if features is not None:
            grouped = jnp.concatenate(
                [grouped_xyz, pointops.group_points(features, nbr)], axis=-1
            )
        else:
            grouped = grouped_xyz
        h = SharedMLP(self.mlp_channels, dtype=self.dtype)(
            grouped.astype(self.dtype), train=train
        )
        return new_xyz, jnp.max(h, axis=2), inds


class FusedSetAbstraction(nn.Module):
    """Index-free SA layer: FPS + fused dense/windowed neighborhood MLP.

    The TPU-native default (``ops/fused_sa.py``): no ball query, no neighbor
    gather; the neighborhood is all in-radius points of a Morton-sorted
    window (all N when ``window >= N``), pooled by max. Uses LayerNorm in the
    pair MLP (fusable; BN batch stats over the masked dense pair grid would
    need multi-pass reductions). ``SetAbstraction`` remains the
    reference-exact path.
    """

    npoint: int
    radius: float
    window: int
    mlp_channels: Sequence[int]
    block: int = 64
    presorted: bool = False
    # Emit centers in ascending-index (Morton-rank) order. Morton order is
    # hierarchical, so a rank-ordered subset of a presorted cloud is itself
    # presorted for every later (coarser-radius) layer — the backbone chains
    # SA layers without any device-side re-sort.
    rank_order_out: bool = False
    fps_presample: int = 8192
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        xyz: jnp.ndarray,
        features: Optional[jnp.ndarray],
        *,
        train: bool,
    ):
        from eda_tpu.ops.fused_sa import SAParams, fused_set_abstraction

        if features is None:
            features = jnp.zeros(xyz.shape[:2] + (0,), xyz.dtype)
        N = xyz.shape[1]
        if self.presorted and N >= 4 * self.fps_presample >= 4 * self.npoint:
            # Two-stage sampling: a Morton-stride subsample is already
            # spatially stratified, so FPS over it matches full FPS coverage
            # at a fraction of the serial cost (the per-step argmax sweeps
            # N lanes; 50k -> 8k is ~6x).
            sub = (jnp.arange(self.fps_presample, dtype=jnp.int32) * N) // self.fps_presample
            sub = jnp.broadcast_to(sub, (xyz.shape[0], self.fps_presample))
            sub_xyz = pointops.gather_points(xyz, sub)
            local = pointops.furthest_point_sample_auto(sub_xyz, self.npoint)
            inds = jnp.take_along_axis(sub, local, axis=1)
        else:
            inds = pointops.furthest_point_sample_auto(xyz, self.npoint)

        kernels, biases, scales, ln_biases = [], [], [], []
        prev = 3 + features.shape[-1]
        for i, ch in enumerate(self.mlp_channels):
            kernels.append(
                self.param(f"w{i}", nn.initializers.lecun_normal(), (prev, ch))
            )
            biases.append(self.param(f"b{i}", nn.initializers.zeros, (ch,)))
            scales.append(self.param(f"ln_scale{i}", nn.initializers.ones, (ch,)))
            ln_biases.append(self.param(f"ln_bias{i}", nn.initializers.zeros, (ch,)))
            prev = ch
        params = SAParams(
            tuple(kernels), tuple(biases), tuple(scales), tuple(ln_biases)
        )
        # On TPU both directions run Pallas: inference the pair kernel (~4x
        # the XLA scan) and training the fused winner-routed backward kernel
        # (ops/pallas/sa_kernel.py:sa_pair_pool_bwd_pallas) — it re-streams
        # the forward's windows and recomputes tiles in VMEM instead of
        # rematerializing the pair grid through HBM. The recompute-XLA hybrid
        # (_hybrid_pool) and the sparse winner-gather path (_winner_pool)
        # remain available but measured slower (net-neutral / 11.8 scenes/s).
        if jax.default_backend() == "tpu":
            impl = "pallas_train" if train else "pallas"
        else:
            impl = "xla"
        out = fused_set_abstraction(
            xyz,
            features,
            inds,
            params,
            radius=self.radius,
            window=self.window,
            block=self.block,
            compute_dtype=self.dtype,
            presorted=self.presorted,
            impl=impl,
            return_rank_order=self.rank_order_out,
        )
        if self.rank_order_out:
            new_features, inds = out
        else:
            new_features = out
        new_xyz = pointops.gather_points(xyz, inds)
        return new_xyz, new_features, inds


class FeaturePropagation(nn.Module):
    """FP layer: 3-NN inverse-DISTANCE interpolation + shared MLP.

    Reference ``pointnet2/pointnet2_modules.py:356-416``; the weights are
    ``1/(sqrt(d2)+1e-8)`` — the ThreeNN wrapper sqrt's its distances
    (``pointnet2_utils.py:151``), see ``pointops.interpolation_weights``.
    """

    mlp_channels: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        unknown_xyz: jnp.ndarray,
        known_xyz: jnp.ndarray,
        unknown_feats: Optional[jnp.ndarray],
        known_feats: jnp.ndarray,
        *,
        train: bool,
    ) -> jnp.ndarray:
        dist2, idx = pointops.three_nn(unknown_xyz, known_xyz)
        weight = pointops.interpolation_weights(dist2)
        interp = pointops.three_interpolate(known_feats, idx, weight)
        if unknown_feats is not None:
            interp = jnp.concatenate([interp, unknown_feats], axis=-1)
        return SharedMLP(self.mlp_channels, dtype=self.dtype)(
            interp.astype(self.dtype), train=train
        )


class PointNetPPBackbone(nn.Module):
    """4 SA + 2 FP layers producing 1024 seeds (``models/backbone_module.py:26-144``).

    Output dict keys keep the reference naming (they are load-bearing for the
    losses and evaluators): ``sa{i}_xyz/features/inds``, ``fp2_features``
    (B, 1024, out_dim), ``fp2_xyz`` (B, 1024, 3), ``fp2_inds`` (B, 1024) —
    indices into the raw input cloud via ``sa1_inds[:, :1024]``
    (``backbone_module.py:142``).
    """

    npoints: Sequence[int] = (2048, 1024, 512, 256)
    radii: Sequence[float] = (0.2, 0.4, 0.8, 1.2)
    nsamples: Sequence[int] = (64, 32, 16, 16)
    mlps: Sequence[Sequence[int]] = (
        (64, 64, 128),
        (128, 128, 256),
        (128, 128, 256),
        (128, 128, 256),
    )
    fp_mlps: Sequence[Sequence[int]] = ((256, 256), (256, 288))
    sa_impl: str = "fused"  # fused (TPU-native) | gather (reference-exact)
    sa_ball_mode: str = "nearest"  # gather path: nearest | first
    sa_windows: Sequence[int] = (2048, 4096, 4096, 4096)
    points_presorted: bool = False  # input pipeline Morton-sorts the cloud
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, point_cloud: jnp.ndarray, *, train: bool) -> dict:
        """point_cloud: (B, N, 3 + input_feature_dim)."""
        xyz = point_cloud[..., 0:3].astype(jnp.float32)
        features = point_cloud[..., 3:] if point_cloud.shape[-1] > 3 else None
        B, N = xyz.shape[:2]

        end_points = {}
        # Tracks each current point's index into the INPUT cloud (which is
        # the coordinate system of seed_inds / point_instance_label).
        domain_orig = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N))
        # Rank-order chaining: with a host-Morton-sorted input cloud, every
        # fused SA layer emits its centers in ascending-index order, which is
        # itself Morton order at every coarser grid (hierarchical Z-order) —
        # so later layers are presorted for free, with no device re-sorts.
        chain = self.sa_impl == "fused" and self.points_presorted
        for i in range(4):
            if self.sa_impl == "fused":
                xyz, features, inds = FusedSetAbstraction(
                    npoint=self.npoints[i],
                    radius=self.radii[i],
                    window=self.sa_windows[i],
                    mlp_channels=self.mlps[i],
                    presorted=chain,
                    rank_order_out=chain,
                    dtype=self.dtype,
                    name=f"sa{i + 1}",
                )(xyz, features, train=train)
            else:
                xyz, features, inds = SetAbstraction(
                    npoint=self.npoints[i],
                    radius=self.radii[i],
                    nsample=self.nsamples[i],
                    mlp_channels=self.mlps[i],
                    ball_mode=self.sa_ball_mode,
                    dtype=self.dtype,
                    name=f"sa{i + 1}",
                )(xyz, features, train=train)
            domain_orig = jnp.take_along_axis(domain_orig, inds.astype(jnp.int32), 1)
            end_points[f"sa{i + 1}_xyz"] = xyz
            end_points[f"sa{i + 1}_features"] = features
            end_points[f"sa{i + 1}_inds"] = domain_orig

        f1 = FeaturePropagation(self.fp_mlps[0], dtype=self.dtype, name="fp1")(
            end_points["sa3_xyz"],
            end_points["sa4_xyz"],
            end_points["sa3_features"],
            end_points["sa4_features"],
            train=train,
        )
        f2 = FeaturePropagation(self.fp_mlps[1], dtype=self.dtype, name="fp2")(
            end_points["sa2_xyz"],
            end_points["sa3_xyz"],
            end_points["sa2_features"],
            f1,
            train=train,
        )
        num_seed = end_points["sa2_xyz"].shape[1]
        end_points["fp2_features"] = f2
        end_points["fp2_xyz"] = end_points["sa2_xyz"]
        if self.sa_impl == "fused" and self.points_presorted:
            # the seeds ARE sa2's points; their input-cloud indices are
            # tracked exactly (the reference approximates this with
            # sa1_inds[:, :1024], backbone_module.py:142)
            end_points["fp2_inds"] = end_points["sa2_inds"]
        else:
            end_points["fp2_inds"] = end_points["sa1_inds"][:, :num_seed]
        return end_points
