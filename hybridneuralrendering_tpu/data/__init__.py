"""Data layer: dataset registry + loaders + host-side preprocessing."""

from hybridneuralrendering_tpu.data import synthetic  # noqa: F401


def create_dataset(name: str, data_root: str, scan: str, cfg,
                   split: str = "train"):
    """Dataset factory (reference data/__init__.py:39-50 registry analog)."""
    if name in ("scannet", "scannet_ft"):
        from hybridneuralrendering_tpu.data.scannet import ScannetScene
        return ScannetScene(data_root, scan, cfg, split)
    if name in ("nerf_synth", "nerf_synth360", "nerf_synth360_ft"):
        from hybridneuralrendering_tpu.data.nerf_synth import NerfSynthScene
        return NerfSynthScene(data_root, scan, cfg, split)
    raise KeyError(f"unknown dataset {name!r}")
