from hybridneuralrendering_tpu.mvs import (  # noqa: F401
    features, filter, mvsnet, point_gen, warp)
