"""Generate a geometrically-consistent synthetic scene in the exported
ScanNet layout (color/ pose/ depth/ intrinsic/) for end-to-end driver runs.

The scene is an analytic textured room (back wall, two side walls, floor,
ceiling) ray-cast per pixel, so multi-view geometry is exact and PSNR against
held-out views is meaningful.  This stands in for real ScanNet scans, which
cannot be downloaded in this environment (data_src is a Dropbox link) — see
PARITY.md "Quality evidence".

Usage:
  python tools/make_fixture_scene.py --out /tmp/scans --scan roomsim \
      --frames 40 --hw 240 320
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def _texture(u, v, seed):
    """Smooth multi-frequency color texture over plane coords (u, v)."""
    rng = np.random.default_rng(seed)
    out = np.zeros(u.shape + (3,), np.float32)
    for k in range(1, 6):
        fu, fv = rng.uniform(0.5, 2.0, 2) * k
        pu, pv = rng.uniform(0, 2 * np.pi, 2)
        amp = rng.uniform(0.05, 0.25, 3) / k
        base = np.sin(2 * np.pi * fu * u + pu) * np.cos(2 * np.pi * fv * v + pv)
        out += base[..., None] * amp
    return 0.5 + out


# room half-extent (meters); walls at +-EXT in x/y, floor/ceiling at z... the
# camera convention is OpenCV (+z forward), the room spans:
#   x in [-1.6, 1.6], y in [-1.2, 1.2], z in [0, 3.2] (back wall at z=3.2)
PLANES = [
    # (point on plane, normal, u-axis, v-axis, texture seed)
    ([0, 0, 3.2], [0, 0, -1], [1, 0, 0], [0, 1, 0], 1),    # back wall
    ([-1.6, 0, 0], [1, 0, 0], [0, 0, 1], [0, 1, 0], 2),    # left wall
    ([1.6, 0, 0], [-1, 0, 0], [0, 0, 1], [0, 1, 0], 3),    # right wall
    ([0, 1.2, 0], [0, -1, 0], [1, 0, 0], [0, 0, 1], 4),    # floor (y down?)
    ([0, -1.2, 0], [0, 1, 0], [1, 0, 0], [0, 0, 1], 5),    # ceiling
]


def raycast(campos, camrot, intrinsic, H, W):
    """Per-pixel first-hit over the room planes -> (rgb [H,W,3], depth [H,W])."""
    ys, xs = np.mgrid[0:H, 0:W]
    pix = np.stack([xs + 0.5, ys + 0.5, np.ones_like(xs)], -1).astype(np.float64)
    dirs_cam = pix @ np.linalg.inv(intrinsic).T
    dirs = dirs_cam @ camrot.T                      # world
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

    best_t = np.full((H, W), np.inf)
    rgb = np.zeros((H, W, 3), np.float32)
    for p0, n, ua, va, seed in PLANES:
        p0, n = np.asarray(p0, np.float64), np.asarray(n, np.float64)
        ua, va = np.asarray(ua, np.float64), np.asarray(va, np.float64)
        denom = dirs @ n
        t = ((p0 - campos) @ n) / np.where(np.abs(denom) < 1e-9, np.inf, denom)
        hitp = campos + dirs * t[..., None]
        inside = ((np.abs(hitp[..., 0]) <= 1.6 + 1e-6)
                  & (np.abs(hitp[..., 1]) <= 1.2 + 1e-6)
                  & (hitp[..., 2] >= -1e-6) & (hitp[..., 2] <= 3.2 + 1e-6))
        ok = (t > 0.05) & inside & (t < best_t)
        u = (hitp @ ua)
        v = (hitp @ va)
        tex = _texture(u, v, seed)
        rgb = np.where(ok[..., None], tex, rgb)
        best_t = np.where(ok, t, best_t)
    # camera-space z depth (ScanNet depth maps store z, not range):
    # z = range * (unit camera-ray z component)
    z = best_t * dirs_cam[..., 2] / np.linalg.norm(dirs_cam, axis=-1)
    z = np.where(np.isfinite(best_t), z, 0.0)
    return np.clip(rgb, 0, 1), z.astype(np.float32)


def camera_path(n):
    """Cameras sweeping an arc inside the room, looking toward the back wall
    with slight yaw — every pose keeps the textured walls in frame."""
    poses = []
    for i in range(n):
        a = (i / max(n - 1, 1) - 0.5)
        campos = np.array([1.0 * np.sin(a * 1.6), 0.25 * np.sin(a * 3.0),
                           0.55 + 0.25 * np.cos(a * 1.6)])
        yaw = a * 0.9
        cy, sy = np.cos(yaw), np.sin(yaw)
        R = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]], np.float64)
        c2w = np.eye(4)
        c2w[:3, :3] = R
        c2w[:3, 3] = campos
        poses.append(c2w)
    return poses


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--scan", default="roomsim")
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--hw", type=int, nargs=2, default=(240, 320))
    args = ap.parse_args()

    from PIL import Image
    import imageio.v2 as imageio

    H, W = args.hw
    f = 0.9 * W
    intr = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float64)
    base = os.path.join(args.out, args.scan, "exported")
    for sub in ("color", "pose", "depth", "intrinsic"):
        os.makedirs(os.path.join(base, sub), exist_ok=True)
    k4 = np.block([[intr, np.zeros((3, 1))], [np.zeros((1, 3)), 1]])
    np.savetxt(os.path.join(base, "intrinsic/intrinsic_color.txt"), k4)
    np.savetxt(os.path.join(base, "intrinsic/intrinsic_depth.txt"), k4)

    for i, c2w in enumerate(camera_path(args.frames)):
        rgb, z = raycast(c2w[:3, 3], c2w[:3, :3], intr, H, W)
        np.savetxt(os.path.join(base, f"pose/{i}.txt"), c2w)
        Image.fromarray((rgb * 255).astype(np.uint8)).save(
            os.path.join(base, f"color/{i}.jpg"), quality=97)
        imageio.imwrite(os.path.join(base, f"depth/{i}.png"),
                        (z * 1000).astype(np.uint16))
        print(f"frame {i + 1}/{args.frames}", end="\r")
    print(f"\nwrote {args.frames} frames to {base}")


if __name__ == "__main__":
    main()
