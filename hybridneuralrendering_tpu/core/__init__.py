from hybridneuralrendering_tpu.core import cameras, encoding, march, rays, sh  # noqa: F401
