from hybridneuralrendering_tpu.utils import metrics, visualizer  # noqa: F401
