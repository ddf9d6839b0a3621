"""VisionX-SLAM TPU: a TPU-native (JAX/XLA/Pallas) visual SLAM framework.

A from-scratch rebuild of the capabilities of the reference C++ system
QinZiwen/VisionX-SLAM (ORB features -> Hamming matching -> Essential/PnP
RANSAC -> keyframe triangulation -> sliding-window bundle adjustment),
re-designed TPU-first:

- fixed shapes + validity masks everywhere (no dynamic control flow on device)
- the map is an immutable pytree of fixed-capacity SoA tables
- descriptor matching is a bit-plane GEMM on the MXU
- RANSAC is a fixed batch of vmapped hypotheses + argmax
- bundle adjustment is batched 6x6/3x3 block Gauss-Newton under lax.scan

Layout:
    ops/       low-level numerics: SE(3)/SO(3), camera models, Pallas kernels
    models/    pipeline stages: ORB extractor, matcher, RANSAC estimators, BA
    parallel/  device meshes, shard_map batch-mapping (throughput mode)
    data/      TUM RGB-D loader, synthetic dataset generator, prefetch
    tracking/  host-side state machine + map state pytree
    eval/      trajectory export (TUM format), ATE/RPE metrics
    utils/     config (reference-compatible flags), logging, timing
    cli/       command-line runners
"""

__version__ = "0.1.0"
