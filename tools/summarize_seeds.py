"""Aggregate the seed-repeat blur matrix (tools/run_blur_seeds.sh) into
mean +- spread rows for PARITY.md (VERDICT r4 #2: every headline quality
delta must carry a spread).

  python tools/summarize_seeds.py .fixture/ckpts_r5
"""
import os
import re
import sys

import numpy as np


def read_scores(d):
    p = os.path.join(d, "scores.txt")
    if not os.path.exists(p):
        return None
    out = {}
    for line in open(p):
        k, v = line.strip().split(":")
        out[k.strip()] = float(v)
    return out


def main():
    root = sys.argv[1]
    cells = {}
    for n in sorted(os.listdir(root)):
        m = re.match(r"s(\d+)_(.+)_test$", n)
        if not m:
            continue
        s = read_scores(os.path.join(root, n))
        if s is None:
            continue
        cells.setdefault(m.group(2), {})[int(m.group(1))] = s

    print("| cell | seeds | PSNR mean±spread | SSIM mean±spread | RMSE mean |")
    print("|---|---|---|---|---|")
    stats = {}
    for cell, by_seed in cells.items():
        ps = np.array([v["PSNR"] for v in by_seed.values()])
        ss = np.array([v["SSIM"] for v in by_seed.values()])
        rm = np.array([v["RMSE"] for v in by_seed.values()])
        stats[cell] = ps
        spread = ps.max() - ps.min()
        print(f"| {cell} | {sorted(by_seed)} | "
              f"{ps.mean():.2f} ± {spread/2:.2f} (range {ps.min():.2f}–"
              f"{ps.max():.2f}) | {ss.mean():.3f} ± "
              f"{(ss.max()-ss.min())/2:.3f} | {rm.mean():.4f} |")

    # paired per-seed deltas (same seed = same init/sampling): tighter than
    # unpaired differences of means
    def paired(a, b):
        if a not in stats or b not in stats:
            return
        ka = cells[a]; kb = cells[b]
        common = sorted(set(ka) & set(kb))
        d = np.array([ka[s]["PSNR"] - kb[s]["PSNR"] for s in common])
        print(f"  {a} - {b}: per-seed dPSNR "
              f"{' '.join(f'{x:+.2f}' for x in d)}  "
              f"(mean {d.mean():+.2f}, range {d.min():+.2f}..{d.max():+.2f})")

    print()
    paired("hfblur_bank", "hfblur_off")
    paired("hfblur_lrn", "hfblur_off")
    paired("hfblur_lrn", "hfblur_bank")
    paired("hf_bank", "hf_off")


if __name__ == "__main__":
    main()
