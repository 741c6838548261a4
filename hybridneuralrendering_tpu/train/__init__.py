from hybridneuralrendering_tpu.train import state, step  # noqa: F401
