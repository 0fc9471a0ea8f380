"""vatl4pose-wacv2024_tpu — a TPU-native (JAX/XLA/Pallas) framework for
Video-specific Active Transfer Learning for human pose estimation.

Re-designed from scratch with the capabilities of
`ImIntheMiddle/VATL4Pose-WACV2024` (WACV 2024 / MVA 2023): heatmap pose
estimators (SimpleBaseline / FastPose / HRNet), uncertainty scoring (THC,
WPU, TPC, HP, MPE, Margin, Entropy), representativeness + query filters
(Influence, weighted K-Means, K-Means, Diversity, Coreset/DUW), per-video
active-transfer fine-tuning, and the evaluation stack (COCO keypoint mAP,
OSPA, ALC).

The compute path is pure JAX (jit/vmap/pjit + Pallas kernels); host-side
runtime pieces (data decode, native affine warp) live under `data/` and
`native/`.
"""

__version__ = "0.1.0"
