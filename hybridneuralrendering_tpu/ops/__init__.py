from hybridneuralrendering_tpu.ops import query, voxel_grid  # noqa: F401
