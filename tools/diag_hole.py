"""Offline hole-closure diagnosis over a lifecycle run's checkpoints.

Round-5 VERDICT #1: the round-4 budget run regrew only ~40% of the carved
points and never closed the hole.  This tool reads the saved `*_state.npz`
checkpoints (train/checkpoint.py flat layout) and reports, per step:
  - live points inside the drop box (the carved hole region)
  - spatial closure: fraction of the box's 2D wall-patch cells (x/y at the
    carved wall) containing at least one live point
  - conf distribution of in-box points (are grown points training up or
    sitting at their conf*prob_mul init / being pruned?)

Usage: python tools/diag_hole.py <ckpt_dir> [--box x0 y0 z0 x1 y1 z1]
"""
from __future__ import annotations

import argparse
import os

import numpy as np

BOX_DEFAULT = (-0.9, -0.7, 2.85, 0.3, 0.5, 3.25)


def load_points(path):
    z = np.load(path)
    table = z["points/table"]
    mask = z["points/mask"].astype(bool)
    return table, mask, int(z["step"]) if "step" in z else -1


def analyze(table, mask, box, cells=24):
    xyz = table[:, :3]
    conf_col = None
    # conf lives at offset 3+feature_dim; feature_dim=32 in every preset used
    # by the lifecycle runs -> column 35 (models/neural_points.ATTR_ORDER)
    conf_col = 3 + 32
    conf = table[:, conf_col]
    lo = np.asarray(box[:3])
    hi = np.asarray(box[3:])
    inside = mask & np.all((xyz >= lo) & (xyz <= hi), axis=1)
    n_in = int(inside.sum())
    # wall-patch closure: project in-box points to x/y, count occupied cells
    if n_in:
        p = xyz[inside]
        cx = np.clip(((p[:, 0] - lo[0]) / (hi[0] - lo[0]) * cells).astype(int),
                     0, cells - 1)
        cy = np.clip(((p[:, 1] - lo[1]) / (hi[1] - lo[1]) * cells).astype(int),
                     0, cells - 1)
        occ = np.zeros((cells, cells), bool)
        occ[cy, cx] = True
        closure = occ.mean()
        c = conf[inside]
        cstats = (float(np.percentile(c, 10)), float(np.median(c)),
                  float(np.percentile(c, 90)))
    else:
        closure, cstats = 0.0, (0.0, 0.0, 0.0)
    return dict(n_in=n_in, closure=float(closure),
                conf_p10=cstats[0], conf_med=cstats[1], conf_p90=cstats[2],
                live=int(mask.sum()))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt_dir")
    ap.add_argument("--box", type=float, nargs=6, default=BOX_DEFAULT)
    ap.add_argument("--cells", type=int, default=24)
    args = ap.parse_args()

    files = sorted(
        (int(f.split("_")[0]), f) for f in os.listdir(args.ckpt_dir)
        if f.endswith("_state.npz"))
    print(f"{'step':>7} {'live':>8} {'in_box':>7} {'closure%':>9} "
          f"{'conf p10/med/p90':>22}")
    for step, f in files:
        table, mask, _ = load_points(os.path.join(args.ckpt_dir, f))
        r = analyze(table, mask, args.box, args.cells)
        print(f"{step:>7} {r['live']:>8} {r['n_in']:>7} "
              f"{100*r['closure']:>8.1f}% "
              f"{r['conf_p10']:>7.3f} {r['conf_med']:>6.3f} "
              f"{r['conf_p90']:>6.3f}")


if __name__ == "__main__":
    main()
