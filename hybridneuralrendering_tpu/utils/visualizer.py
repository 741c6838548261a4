"""Logging / observability hub (reference utils/visualizer.py:42-183).

Append-only log.txt, accumulated loss averages with derived PSNR, image dumps,
neural-point txt dumps, and optional video assembly — same artifact layout as
the reference (`checkpoints/<name>/{log.txt,images/,points/}`).
"""

from __future__ import annotations

import os
import time
from collections import defaultdict
from typing import Dict, Optional

import numpy as np


def to8b(x: np.ndarray) -> np.ndarray:
    return (255 * np.clip(np.asarray(x), 0, 1)).astype(np.uint8)


class Visualizer:
    def __init__(self, out_dir: str, name: str = "run"):
        self.dir = os.path.join(out_dir, name)
        self.img_dir = os.path.join(self.dir, "images")
        self.pnt_dir = os.path.join(self.dir, "points")
        os.makedirs(self.img_dir, exist_ok=True)
        os.makedirs(self.pnt_dir, exist_ok=True)
        self.log_path = os.path.join(self.dir, "log.txt")
        self._acc: Dict[str, list] = defaultdict(list)
        self._t0 = time.time()

    def log(self, msg: str):
        stamp = time.strftime("%Y-%m-%d %H:%M:%S")
        with open(self.log_path, "a") as f:
            f.write(f"[{stamp}] {msg}\n")
        print(msg, flush=True)

    # -- loss accumulation (visualizer.py:144-169) ------------------------

    def accumulate_losses(self, items: Dict[str, float]):
        for k, v in items.items():
            self._acc[k].append(float(v))

    def print_losses(self, step: int, extra: str = ""):
        parts = [f"step {step}"]
        for k, vals in sorted(self._acc.items()):
            mean = float(np.mean(vals))
            parts.append(f"{k}={mean:.6f}")
            self.add_scalar(step, k, mean)
            if k.endswith("coarse_raycolor"):
                psnr = -10 * np.log10(max(mean, 1e-10))
                parts.append(f"PSNR[{k}]={psnr:.3f}")
                self.add_scalar(step, f"PSNR[{k}]", psnr)
        if extra:
            parts.append(extra)
        self.log("  ".join(parts))
        self._acc.clear()

    def add_scalar(self, step: int, tag: str, value: float):
        """Machine-readable scalar stream `scalars.jsonl` — the equivalent of
        the reference's optional tensorboardX export
        (utils/visualizer.py:51-55,177-183), without the dependency: one
        JSON object per line, trivially loadable into pandas/tensorboard."""
        import json
        with open(os.path.join(self.dir, "scalars.jsonl"), "a") as f:
            f.write(json.dumps({"step": int(step), "tag": tag,
                                "value": float(value)}) + "\n")

    # -- artifacts --------------------------------------------------------

    def save_image(self, img: np.ndarray, step: int, name: str):
        import imageio.v2 as imageio
        path = os.path.join(self.img_dir, f"step-{step:04d}-{name}.png")
        imageio.imwrite(path, to8b(img))
        return path

    def save_neural_points(self, xyz: np.ndarray, step: int,
                           color: Optional[np.ndarray] = None):
        path = os.path.join(self.pnt_dir, f"step-{step}.txt")
        data = xyz if color is None else np.concatenate(
            [xyz, to8b(color)], axis=-1)
        np.savetxt(path, data, delimiter=";")
        return path

    def gen_video(self, pattern_dir: Optional[str] = None, fps: int = 20,
                  out_name: str = "video.mp4"):
        """mp4 via imageio/ffmpeg when available, else GIF (the reference
        writes .mov or .gif, utils/visualizer.py:88-98)."""
        import imageio.v2 as imageio
        d = pattern_dir or self.img_dir
        frames = sorted(f for f in os.listdir(d) if f.endswith(".png"))
        if not frames:
            return None
        path = os.path.join(self.dir, out_name)
        try:
            with imageio.get_writer(path, fps=fps) as w:
                for f in frames:
                    w.append_data(imageio.imread(os.path.join(d, f)))
            return path
        except Exception:
            path = os.path.splitext(path)[0] + ".gif"
            with imageio.get_writer(path, duration=1000.0 / fps) as w:
                for f in frames:
                    w.append_data(imageio.imread(os.path.join(d, f)))
            return path
