from hybridneuralrendering_tpu.io import torch_import  # noqa: F401
