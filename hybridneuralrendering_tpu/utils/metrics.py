"""Image quality metrics: PSNR / SSIM / RMSE (+ optional LPIPS via torch).

Mirrors the reference's metric stack (/root/reference/run/evaluate.py:34-97):
per-image metrics over saved/rendered images, means written to scores.  SSIM
follows skimage's gaussian-weighted formulation (the reference calls
`structural_similarity`); LPIPS defers to the torch `lpips` package when
importable (the reference computes metrics from PNGs offline, so calling the
original torch LPIPS is faithful — SURVEY §7.3), else reports None.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np


def psnr(img: np.ndarray, ref: np.ndarray, max_val: float = 1.0) -> float:
    mse = float(np.mean((np.asarray(img, np.float64)
                         - np.asarray(ref, np.float64)) ** 2))
    if mse <= 1e-12:
        return 99.0
    return 10.0 * np.log10(max_val ** 2 / mse)


def rmse(img: np.ndarray, ref: np.ndarray) -> float:
    return float(np.sqrt(np.mean((np.asarray(img, np.float64)
                                  - np.asarray(ref, np.float64)) ** 2)))


def _filter2d_sep(img: np.ndarray, k: np.ndarray) -> np.ndarray:
    """Separable 'valid' convolution along the first two axes."""
    from numpy.lib.stride_tricks import sliding_window_view
    n = len(k)
    v = sliding_window_view(img, n, axis=0)
    img = np.tensordot(v, k, axes=([-1], [0]))
    v = sliding_window_view(img, n, axis=1)
    return np.tensordot(v, k, axes=([-1], [0]))


def ssim(img: np.ndarray, ref: np.ndarray, max_val: float = 1.0,
         k1: float = 0.01, k2: float = 0.03, win_size: int = 11) -> float:
    """Mean SSIM matching the reference protocol:
    `compare_ssim(gt, img, 11, multichannel=True)`
    (/root/reference/run/evaluate.py:60-61) — skimage defaults: UNIFORM
    win_size x win_size window (gaussian_weights=False), sample covariance
    (N/(N-1) normalization), per-channel SSIM maps averaged after cropping
    (win_size-1)//2 border pixels.

    `max_val` is skimage's data_range.  Note: old skimage infers
    data_range=2.0 for float inputs (dtype range [-1,1]); numbers produced by
    the reference's environment carry that quirk.  We default to the correct
    1.0 for [0,1] images; pass max_val=2.0 to reproduce the quirk bit-exactly.
    """
    img = np.asarray(img, np.float64)
    ref = np.asarray(ref, np.float64)
    if img.ndim == 2:
        img, ref = img[..., None], ref[..., None]
    k = np.full((win_size,), 1.0 / win_size)
    npix = win_size * win_size
    cov_norm = npix / (npix - 1.0)          # skimage use_sample_covariance
    c1, c2 = (k1 * max_val) ** 2, (k2 * max_val) ** 2
    vals = []
    for c in range(img.shape[-1]):
        x, y = img[..., c], ref[..., c]
        mx = _filter2d_sep(x, k)
        my = _filter2d_sep(y, k)
        vx = cov_norm * (_filter2d_sep(x * x, k) - mx ** 2)
        vy = cov_norm * (_filter2d_sep(y * y, k) - my ** 2)
        cov = cov_norm * (_filter2d_sep(x * y, k) - mx * my)
        s = ((2 * mx * my + c1) * (2 * cov + c2)) / (
            (mx ** 2 + my ** 2 + c1) * (vx + vy + c2))
        vals.append(s.mean())
    return float(np.mean(vals))


_LPIPS_CACHE: Dict[str, object] = {}


def lpips(img: np.ndarray, ref: np.ndarray,
          net: str = "alex") -> Optional[float]:
    """LPIPS via the torch lpips package if available (offline metric parity
    with run/evaluate.py:47-83); None when the package is missing."""
    try:
        import lpips as lpips_pkg  # type: ignore
        import torch
    except ImportError:
        return None
    if net not in _LPIPS_CACHE:
        _LPIPS_CACHE[net] = lpips_pkg.LPIPS(net=net, verbose=False)
    model = _LPIPS_CACHE[net]

    def prep(x):
        t = torch.from_numpy(np.asarray(x, np.float32).transpose(2, 0, 1))
        return (t * 2 - 1)[None]

    with torch.no_grad():
        return float(model(prep(img), prep(ref)))


def report_metrics(preds: Sequence[np.ndarray], gts: Sequence[np.ndarray],
                   with_lpips: bool = True) -> Dict[str, float]:
    """Aggregate means over a list of rendered/gt image pairs
    (run/evaluate.py:34-97 protocol)."""
    out: Dict[str, list] = {"psnr": [], "ssim": [], "rmse": []}
    if with_lpips:
        out["lpips"] = []
        out["vgglpips"] = []
    for p, g in zip(preds, gts):
        out["psnr"].append(psnr(p, g))
        out["ssim"].append(ssim(p, g))
        out["rmse"].append(rmse(p, g))
        if with_lpips:
            l_a = lpips(p, g, "alex")
            l_v = lpips(p, g, "vgg")
            if l_a is not None:
                out["lpips"].append(l_a)
            if l_v is not None:
                out["vgglpips"].append(l_v)
    return {k: float(np.mean(v)) for k, v in out.items() if len(v)}
