"""Quality-aware frame-weight precompute tool.

Counterpart of /root/reference/raft/demo_content_aware_weights.py: loads the
training frames of a ScanNet scene (every 5th frame, the train split), runs
RAFT optical flow between consecutive training frames (pretrained weights via
--raft-ckpt, imported with io/torch_import.import_raft), chains
Laplacian-variance blur scores into absolute per-frame scores, normalizes
with a sliding window, and writes
`<out>/frame_weights_step5/<scene>_frame_weight_step5.npy` — the file
data/scannet.py loads when `use_frame_weight` is on
(scannet_ft_dataset.py:502).

Usage:
  python -m hybridneuralrendering_tpu.cli.frame_weights \
      --data-root /path/to/scans --scan scene0241_01 \
      --raft-ckpt raft-things.pth --out /path/to/scans
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-root", required=True)
    p.add_argument("--scan", default="scene0241_01")
    p.add_argument("--out", default=None,
                   help="output root (default: data-root)")
    p.add_argument("--raft-ckpt", default=None,
                   help="pretrained RAFT .pth; identity flow if omitted "
                        "(serviceable for small camera steps)")
    p.add_argument("--iters", type=int, default=12, help="RAFT iterations")
    p.add_argument("--window", type=int, default=10)
    p.add_argument("--window-step", type=int, default=5)
    p.add_argument("--preset", default="scannet_full")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    from hybridneuralrendering_tpu import config as C
    from hybridneuralrendering_tpu.data import frame_weights as FW
    from hybridneuralrendering_tpu.data.scannet import ScannetScene

    cfg = C.PRESETS[args.preset](args.scan) if args.preset.startswith(
        "scannet") else C.PRESETS[args.preset]()
    # weights are an input of the loader; compute them without requiring them
    cfg = cfg.replace(loss=C.LossConfig(
        **{**cfg.loss.__dict__, "use_frame_weight": False}))
    ds = ScannetScene(args.data_root, args.scan, cfg, "train")

    frames = []
    for vid in ds.train_id_list:
        img = ds.image(vid)
        frames.append((img.mean(-1) * 255.0).astype(np.float32))
    print(f"{len(frames)} training frames (every 5th)")

    flow_fn = None
    if args.raft_ckpt:
        from hybridneuralrendering_tpu.flow import raft as raft_mod
        from hybridneuralrendering_tpu.io import torch_import as TI
        params = TI.import_raft(TI.load_torch_state_dict(args.raft_ckpt))
        flow_fn = raft_mod.make_flow_fn(params, iters=args.iters)
        print(f"RAFT weights imported from {args.raft_ckpt}")
    else:
        print("no --raft-ckpt: identity flow")

    weights = FW.compute_frame_weights(
        frames, flow_fn=flow_fn, window_size=args.window,
        step=args.window_step)

    out_root = args.out or args.data_root
    out_dir = os.path.join(out_root, "frame_weights_step5")
    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(out_dir, f"{args.scan}_frame_weight_step5.npy")
    np.save(out_path, weights.astype(np.float32))
    print(f"wrote {out_path}: {weights.shape} "
          f"min={weights.min():.4f} max={weights.max():.4f}")


if __name__ == "__main__":
    main()
