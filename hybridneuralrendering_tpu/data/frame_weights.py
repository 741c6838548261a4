"""Quality-aware frame weights (offline preprocessing).

First-party port of the reference's content-aware weight pipeline
(/root/reference/raft/demo_content_aware_weights.py:78-226): per training
frame, a Laplacian edge map scores sharpness; the *next* frame's edge map —
flow-warped into the current frame — anchors a relative scale so per-pair
scores chain into absolute scores; a sliding window normalizes them into
loss weights.

The optical-flow alignment is pluggable (`flow_fn`): the reference uses the
vendored RAFT network purely as an offline tool.  For mostly-static camera
steps (every-5th ScanNet frames) identity flow is a serviceable default; any
flow implementation can be slotted in without touching this logic.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np


def _mean_blur(img: np.ndarray, k: int = 5) -> np.ndarray:
    """cv2.blur equivalent: k x k box filter with reflected... cv2 uses
    BORDER_REFLECT_101 by default; edges contribute negligibly to the variance
    statistic, so we use 'same' averaging via cumulative sums with edge pad."""
    pad = k // 2
    padded = np.pad(img, pad, mode="reflect")
    c = np.cumsum(np.cumsum(padded, axis=0), axis=1)
    c = np.pad(c, ((1, 0), (1, 0)))
    h, w = img.shape
    s = (c[k:k + h, k:k + w] - c[:h, k:k + w] - c[k:k + h, :w] + c[:h, :w])
    return s / (k * k)


LAPLACIAN = np.array([[0, 1, 0], [1, -4, 1], [0, 1, 0]], np.float64)


def laplacian_edge(img_gray: np.ndarray, blur_func: str = "mean",
                   k_size: int = 5) -> np.ndarray:
    """detect_blurry equivalent (demo_content_aware_weights.py:78-92)."""
    img = np.asarray(img_gray, np.float64)
    if blur_func == "mean":
        img = _mean_blur(img, k_size)
    padded = np.pad(img, 1, mode="reflect")
    out = (padded[:-2, 1:-1] + padded[2:, 1:-1] + padded[1:-1, :-2]
           + padded[1:-1, 2:] - 4 * img)
    return out


def warp_by_flow(img: np.ndarray, flow: np.ndarray) -> np.ndarray:
    """Nearest-neighbor backward warp: out(x) = img(x + flow(x)).
    flow: [H, W, 2] (fx, fy).  Out-of-range samples -> 0 (matches the
    reference's zero-padded grid_sample warp, :23-52)."""
    h, w = img.shape
    ys, xs = np.mgrid[0:h, 0:w]
    sx = np.rint(xs + flow[..., 0]).astype(int)
    sy = np.rint(ys + flow[..., 1]).astype(int)
    ok = (sx >= 0) & (sx < w) & (sy >= 0) & (sy < h)
    out = np.zeros_like(img)
    out[ok] = img[sy[ok], sx[ok]]
    return out


def blur_scores(frames_gray: Sequence[np.ndarray],
                flow_fn: Optional[Callable] = None,
                border: int = 20):
    """Per-frame (cur, next-warped) Laplacian variance pairs.

    frames_gray: training frames in order (already the every-step'th subset).
    flow_fn(img1, img2) -> [H, W, 2] flow or None for identity alignment.
    Returns (scores_cur, scores_ref) lists — the inputs to chain_scores."""
    scores_cur, scores_ref = [], []
    n = len(frames_gray)
    for i in range(n):
        cur = np.asarray(frames_gray[i], np.float64)
        ref = np.asarray(frames_gray[min(i + 1, n - 1)], np.float64)
        e1 = laplacian_edge(cur)
        e2 = laplacian_edge(ref)
        h, w = cur.shape
        mask1 = np.zeros((h, w))
        mask1[border:-border, border:-border] = 1
        mask2 = mask1.copy()
        if flow_fn is not None and i + 1 < n:
            flow = flow_fn(cur, ref)
            e2 = warp_by_flow(e2, flow)
            mask2 = warp_by_flow(mask2, flow)
        used = (mask1 * mask2) == 1
        scores_cur.append(e1[used].var())
        scores_ref.append(e2[used].var())
    return scores_cur, scores_ref


def chain_scores(scores_cur: Sequence[float],
                 scores_ref: Sequence[float]) -> np.ndarray:
    """Chain per-pair relative scales into absolute scores
    (demo_content_aware_weights.py:186-198)."""
    out = []
    scale = 1.0
    n = len(scores_cur)
    for i in range(n):
        cur = scores_cur[i] * scale
        ref = scores_ref[i] * scale
        out.append(cur)
        if i == n - 1:
            continue
        scale = ref / scores_cur[i + 1]
    return np.asarray(out)


def sliding_window_weights(scores_absolute: np.ndarray, window_size: int = 10,
                           step: int = 5) -> np.ndarray:
    """Normalize absolute scores to weights over overlapping windows
    (demo_content_aware_weights.py:202-220)."""
    n = len(scores_absolute)
    weight = np.zeros(n)
    count = np.zeros(n)
    begin = 0
    while True:
        end = begin + window_size
        last = end >= n
        end = min(end, n)
        bundle = scores_absolute[begin:end]
        weight[begin:end] += bundle / bundle.mean()
        count[begin:end] += 1
        if last:
            break
        begin += step
    return weight / count


def compute_frame_weights(frames_gray: Sequence[np.ndarray],
                          flow_fn: Optional[Callable] = None,
                          window_size: int = 10, step: int = 5,
                          border: int = 20) -> np.ndarray:
    sc, sr = blur_scores(frames_gray, flow_fn, border)
    return sliding_window_weights(chain_scores(sc, sr), window_size, step)
