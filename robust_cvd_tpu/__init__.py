"""robust_cvd_tpu — a TPU-native framework for Robust Consistent Video Depth.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
facebookresearch/robust_cvd (CVPR 2021): temporally consistent dense video
depth + camera poses via test-time optimization.

Architecture (TPU-first, not a port):
  - The whole video lives as HBM-resident tensors (`VideoStore`), not a
    lazily-cached C++ file store (reference lib/DepthVideo.*).
  - Per-frame depth inference (MiDaS-v2) and per-pair optical flow (RAFT) are
    batched, jitted Flax models over frame/pair stacks, not sequential
    per-item PyTorch loops.
  - The Ceres CPU sparse solver (reference lib/PoseOptimizer.cpp) is replaced
    by a matrix-free Levenberg-Marquardt solver (jvp/vjp normal equations +
    CG) running fully on-device, with IRLS Cauchy robustification.
  - Scaling is `jax.sharding.Mesh` + shard_map over the frame/pair axes
    (ICI collectives), not torch.nn.DataParallel.

Subpackages:
  io        on-disk formats (.raw images, frames.txt, video.dat result tree)
  utils     frame ranges, pair sampling, small helpers
  ops       differentiable geometry, resampling, corner response, Pallas kernels
  models    MiDaS-v2 and RAFT in Flax + torch checkpoint porting
  solver    transforms, flow constraints, LM solver, pose optimization
  training  joint loss + test-time fine-tuning loop
  pipeline  stage orchestration (extract, depth, flow, masks, finetune)
  parallel  device mesh + sharding helpers
"""

__version__ = "0.1.0"
