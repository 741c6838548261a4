from hybridneuralrendering_tpu.data import synthetic  # noqa: F401
