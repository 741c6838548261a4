"""TPU-native hybrid neural rendering framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
CVMI-Lab/HybridNeuralRendering ("Hybrid Neural Rendering for Large-Scale Scenes
with Motion Blur", CVPR 2023): point-based volumetric rendering with voxel-grid
neighbor queries, hybrid image-feature fusion, and blur-aware training —
engineered for TPU meshes (fixed shapes, sort/segment instead of atomics,
rays sharded over the data axis).
"""

__version__ = "0.1.0"
