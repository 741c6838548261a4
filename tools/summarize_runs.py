"""Summarize evidence runs: scores.txt + scalars.jsonl -> markdown tables.

Reads every `<ckpt-dir>/<name>_test/scores.txt` plus the matching train run's
scalars.jsonl (eval_psnr curve, grow/prune events) and prints the PARITY.md
tables for the blur matrix / lifecycle / budget runs.

  python tools/summarize_runs.py .fixture/ckpts_r4 [name ...]
"""
import json
import os
import sys


def read_scores(d):
    p = os.path.join(d, "scores.txt")
    if not os.path.exists(p):
        return None
    out = {}
    for line in open(p):
        k, v = line.strip().split(":")
        out[k.strip()] = float(v)
    return out


def read_scalars(d):
    p = os.path.join(d, "scalars.jsonl")
    if not os.path.exists(p):
        return []
    return [json.loads(l) for l in open(p)]


def main():
    root = sys.argv[1]
    names = sys.argv[2:] or sorted(
        n[:-5] for n in os.listdir(root) if n.endswith("_test")
        and os.path.exists(os.path.join(root, n, "scores.txt")))
    print(f"| run | PSNR | SSIM | RMSE | eval curve (step:psnr) | "
          f"grow events (step:+n) |")
    print("|---|---|---|---|---|---|")
    for name in names:
        sc = read_scores(os.path.join(root, name + "_test"))
        if sc is None:
            continue
        scal = read_scalars(os.path.join(root, name))
        curve = " ".join(f"{s['step']}:{s['value']:.2f}"
                         for s in scal if s["tag"] == "eval_psnr")
        grows = " ".join(f"{s['step']}:+{int(s['value'])}"
                         for s in scal if s["tag"] == "grown_points")
        print(f"| {name} | {sc['psnr']:.2f} | {sc['ssim']:.4f} | "
              f"{sc['rmse']:.4f} | {curve} | {grows} |")


if __name__ == "__main__":
    main()
