from hybridneuralrendering_tpu.flow import raft  # noqa: F401
