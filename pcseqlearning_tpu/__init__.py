"""pcseqlearning_tpu — a TPU-native (JAX/XLA/Pallas/pjit) point-cloud-sequence
learning framework with the capabilities of PCSeqLearning (an OpenPCDet fork).

Layers (mirrors the capability map in /root/repo/SURVEY.md):
  ops/            TPU kernel layer: hash-grid neighbor search, segment reducers,
                  connected components, 3x3 eigh/SVD, points-in-boxes, rotated
                  IoU/NMS, FPS, voxelization, sparse convolution.
  preprocessing/  The unsupervised cluster-sequence extraction pipeline:
                  ground removal, cluster proposal, registration & tracking.
  models/         Config-driven 3D detectors (VFE -> 3D backbone -> BEV ->
                  dense head -> ROI head) built on flax.linen.
  datasets/       Waymo sequence data pipeline (npy-based, TF-free at runtime).
  parallel/       SPMD utilities: mesh construction, sharded train steps.
  runtime/        Train/eval loops, optimization, checkpointing.
"""

__version__ = "0.1.0"
