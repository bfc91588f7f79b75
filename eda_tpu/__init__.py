"""eda_tpu — a TPU-native 3D visual-grounding framework.

A from-scratch JAX / XLA / Pallas rebuild of the capabilities of yanmin-wu/EDA
("Explicit Text-Decoupling and Dense Alignment for 3D Visual Grounding",
CVPR 2023): grounding a natural-language utterance to a 3D bounding box in a
ScanNet point cloud, across ScanRefer / SR3D / NR3D, in two-stage
(detected-box-conditioned) and single-stage modes.

Subpackages
-----------
ops       Point-cloud primitives (FPS, ball-query grouping, 3-NN interpolation)
          as pure-jnp references plus Pallas TPU kernels, and box/IoU/NMS utils.
models    Flax modules: PointNet++ backbone, RoBERTa text encoder, cross-modal
          encoder/decoder, prediction heads — one jit-compiled XLA graph.
losses    Hungarian matching (on device) + dense position/semantic alignment.
data      Host-side input pipeline: ScanNet scene store, annotation loaders,
          text decoupling, augmentation, fixed-shape batching.
parallel  Mesh construction and sharding rules (DP today; mesh axes reserved
          for model parallelism).
train     Train/eval steps, optimizer groups, LR schedules, checkpointing.
eval      Grounding accuracy and detection-AP evaluators.
"""

__version__ = "0.1.0"
