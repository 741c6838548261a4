from hybridneuralrendering_tpu.models import (  # noqa: F401
    aggregator, blur, feature_pyramid, losses, mlp, neural_points, renderer)
