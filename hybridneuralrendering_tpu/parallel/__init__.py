from hybridneuralrendering_tpu.parallel import mesh  # noqa: F401
