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


_TEXTURE_MODE = "classic"


def _texture(u, v, seed):
    """Multi-frequency color texture over plane coords (u, v).

    'classic' (the round-2/3 fixture scenes): bands k=1..5, max ~10
    cycles/unit — smooth enough that a 10-px motion blur barely changes it.
    'hf' adds bands up to k=12 (~24 cycles/unit, ~4-px period on the wall at
    the default intrinsics): resolvable by pointwise sampling but destroyed
    by a 8-13 px blur streak — the regime where blur-aware training has
    something to protect (the blur-evidence scenes)."""
    rng = np.random.default_rng(seed)
    out = np.zeros(u.shape + (3,), np.float32)
    kmax = 12 if _TEXTURE_MODE == "hf" else 5
    for k in range(1, kmax + 1):
        fu, fv = rng.uniform(0.5, 2.0, 2) * k
        pu, pv = rng.uniform(0, 2 * np.pi, 2)
        # classic bands fall off as 1/k; the hf bands (k>5) keep a constant
        # moderate amplitude so fine detail carries real contrast
        amp = (rng.uniform(0.05, 0.15, 3) if _TEXTURE_MODE == "hf" and k > 5
               else rng.uniform(0.05, 0.25, 3) / k)
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


# ---------------------------------------------------------------------------
# Blender-layout object fixture (NeRF-synthetic stand-in): a textured sphere
# and box near the origin, orbited by cameras at radius 4 — the lego/chair
# workload geometry (near=2, far=6, white bg, RGBA renders, fused.ply cloud).
# ---------------------------------------------------------------------------

SPH_C = np.array([0.0, 0.0, 0.25])
SPH_R = 0.45
BOX_LO = np.array([-0.55, -0.55, -0.6])
BOX_HI = np.array([0.55, 0.55, -0.25])


def _sphere_hit(campos, dirs):
    oc = campos - SPH_C
    b = dirs @ oc
    c = oc @ oc - SPH_R ** 2
    disc = b * b - c
    t = -b - np.sqrt(np.maximum(disc, 0.0))
    return np.where((disc > 0) & (t > 1e-3), t, np.inf)


def _box_hit(campos, dirs):
    with np.errstate(divide="ignore", invalid="ignore"):
        t0 = (BOX_LO - campos) / dirs
        t1 = (BOX_HI - campos) / dirs
    tmin = np.max(np.minimum(t0, t1), axis=-1)
    tmax = np.min(np.maximum(t0, t1), axis=-1)
    hit = (tmax >= np.maximum(tmin, 1e-3))
    return np.where(hit, tmin, np.inf)


def _object_color(p, normal):
    """Smooth position-based texture + simple lambertian shading."""
    base = 0.5 + 0.45 * np.stack([
        np.sin(6.0 * p[..., 0]) * np.cos(4.0 * p[..., 1]),
        np.sin(5.0 * p[..., 1] + 1.0) * np.cos(3.0 * p[..., 2]),
        np.sin(4.0 * p[..., 2] + 2.0) * np.cos(5.0 * p[..., 0])], -1)
    light = np.asarray([0.4, 0.3, 0.85])
    lam = 0.55 + 0.45 * np.clip((normal * light).sum(-1), 0, 1)
    return np.clip(base * lam[..., None], 0, 1)


def raycast_object(campos, camrot, intrinsic, H, W):
    """First-hit over sphere+box -> (rgb [H,W,3], alpha [H,W])."""
    ys, xs = np.mgrid[0:H, 0:W]
    pix = np.stack([xs + 0.5, ys + 0.5, np.ones_like(xs)], -1).astype(np.float64)
    dirs = (pix @ np.linalg.inv(intrinsic).T) @ camrot.T
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    ts = _sphere_hit(campos, dirs)
    tb = _box_hit(campos, dirs)
    t = np.minimum(ts, tb)
    hit = np.isfinite(t)
    p = campos + dirs * np.where(hit, t, 0.0)[..., None]
    n_sph = (p - SPH_C) / SPH_R
    ctr = (BOX_LO + BOX_HI) / 2
    ext = (BOX_HI - BOX_LO) / 2
    rel = (p - ctr) / ext
    ax = np.argmax(np.abs(rel), axis=-1)
    n_box = np.eye(3)[ax] * np.sign(
        np.take_along_axis(rel, ax[..., None], -1))
    normal = np.where((ts < tb)[..., None], n_sph, n_box)
    rgb = _object_color(p, normal)
    rgb = np.where(hit[..., None], rgb, 1.0)
    return rgb, hit.astype(np.float32)


def sample_object_surface(n, rng):
    """Point cloud on the sphere/box surfaces (COLMAP fused.ply stand-in)."""
    ns = n // 2
    v = rng.normal(size=(ns, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    sph = SPH_C + SPH_R * v
    nb = n - ns
    face = rng.integers(0, 6, nb)
    uv = rng.uniform(0, 1, (nb, 2))
    box = np.empty((nb, 3))
    ext = BOX_HI - BOX_LO
    for f in range(6):
        m = face == f
        a, b_ = [(1, 2), (1, 2), (0, 2), (0, 2), (0, 1), (0, 1)][f]
        fixed = f % 2
        pts = np.empty((m.sum(), 3))
        pts[:, f // 2] = BOX_LO[f // 2] + fixed * ext[f // 2]
        pts[:, a] = BOX_LO[a] + uv[m, 0] * ext[a]
        pts[:, b_] = BOX_LO[b_] + uv[m, 1] * ext[b_]
        box[m] = pts
    return np.concatenate([sph, box]).astype(np.float32)


def write_ply(path, xyz):
    with open(path, "wb") as f:
        f.write((f"ply\nformat binary_little_endian 1.0\n"
                 f"element vertex {len(xyz)}\n"
                 "property float x\nproperty float y\nproperty float z\n"
                 "end_header\n").encode())
        f.write(np.ascontiguousarray(xyz, "<f4").tobytes())


def make_blender_fixture(out, scan, n_train, n_test, H, W, seed=0):
    import json

    from PIL import Image

    from hybridneuralrendering_tpu.data.nerf_synth import (BLENDER2OPENCV,
                                                           pose_spherical)
    root = os.path.join(out, scan)
    rng = np.random.default_rng(seed)
    cax = 0.6911112070083618          # lego's camera_angle_x
    focal = 0.5 * W / np.tan(0.5 * cax)
    intr = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]])

    for split, n in (("train", n_train), ("test", n_test)):
        os.makedirs(os.path.join(root, split), exist_ok=True)
        frames = []
        for i in range(n):
            theta = -180 + 360.0 * (i + (0.5 if split == "test" else 0.0)) / n
            phi = -30.0 + 12.0 * np.sin(2.1 * i + (1 if split == "test" else 0))
            c2w_b = pose_spherical(theta, phi, 4.0).astype(np.float64)
            c2w = c2w_b @ BLENDER2OPENCV
            rgb, alpha = raycast_object(c2w[:3, 3], c2w[:3, :3], intr, H, W)
            rgba = np.concatenate([rgb, alpha[..., None]], -1)
            Image.fromarray((rgba * 255).astype(np.uint8), "RGBA").save(
                os.path.join(root, split, f"r_{i}.png"))
            frames.append({"file_path": f"./{split}/r_{i}",
                           "transform_matrix": c2w_b.tolist()})
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": cax, "frames": frames}, f)
        print(f"{split}: {n} frames")

    write_ply(os.path.join(root, "fused.ply"),
              sample_object_surface(60_000, rng))
    print(f"wrote blender fixture to {root}")


def _axis_rotation(axis: np.ndarray, angle: float) -> np.ndarray:
    """Rodrigues rotation matrix about a unit axis."""
    K = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * (K @ K)


def render_motion_blurred(c2w, intr, H, W, total_deg, taps, rng):
    """True motion blur: average `taps` raycasts along a small camera
    rotation sweep (the degradation the reference's blur module targets —
    linear camera-motion streaks, scannet_ft_dataset.py:184-242's kernel
    model; here the blur is generated by actual multi-pose rendering, NOT by
    convolving with the bank's own kernels, so the A/B is honest).
    Returns (blurred rgb, streak length in pixels)."""
    phi = rng.uniform(0, 2 * np.pi)
    # axis in the camera's right/up plane -> image-space streak at angle phi
    axis_cam = np.array([np.cos(phi), np.sin(phi), 0.0])
    axis_w = c2w[:3, :3] @ axis_cam
    # per-frame magnitude jitter: hand-held shake is not uniform
    theta = np.deg2rad(total_deg) * rng.uniform(0.6, 1.4)
    acc = None
    for t in np.linspace(-0.5, 0.5, taps):
        Rd = _axis_rotation(axis_w, t * theta)
        rgb, _ = raycast(c2w[:3, 3], Rd @ c2w[:3, :3], intr, H, W)
        acc = rgb if acc is None else acc + rgb
    f = intr[0, 0]
    return acc / taps, float(f * theta)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--scan", default="roomsim")
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--test-frames", type=int, default=10)
    ap.add_argument("--hw", type=int, nargs=2, default=(240, 320))
    ap.add_argument("--layout", choices=("scannet", "blender"),
                    default="scannet")
    ap.add_argument("--blur-frac", type=float, default=0.0,
                    help="motion-blur this fraction of TRAINING frames "
                         "(every --train-step'th frame); test frames stay "
                         "sharp — the reference's degradation scenario")
    ap.add_argument("--blur-deg", type=float, default=1.6,
                    help="total camera rotation during exposure (degrees); "
                         "1.6 deg ~ 8 px streak at the default intrinsics")
    ap.add_argument("--blur-taps", type=int, default=16,
                    help="sub-exposure renders averaged per blurred frame")
    ap.add_argument("--train-step", type=int, default=5,
                    help="every-Nth-frame-trains split (loader default 5)")
    ap.add_argument("--texture", choices=("classic", "hf"), default="classic",
                    help="'hf' adds high-frequency texture bands (see "
                         "_texture) — required for meaningful blur A/Bs")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    global _TEXTURE_MODE
    _TEXTURE_MODE = args.texture
    if args.layout == "blender":
        H, W = args.hw
        make_blender_fixture(args.out, args.scan, args.frames,
                             args.test_frames, H, W)
        return

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

    rng = np.random.default_rng(args.seed)
    train_ids = list(range(0, args.frames, args.train_step))
    n_blur = int(round(args.blur_frac * len(train_ids)))
    blur_ids = sorted(rng.choice(train_ids, n_blur, replace=False).tolist()) \
        if n_blur else []
    blur_info = {}
    for i, c2w in enumerate(camera_path(args.frames)):
        rgb, z = raycast(c2w[:3, 3], c2w[:3, :3], intr, H, W)
        if i in blur_ids:
            # depth stays the sharp center-pose render (a sensor snapshot);
            # only the color frame is degraded
            rgb, streak_px = render_motion_blurred(
                c2w, intr, H, W, args.blur_deg, args.blur_taps, rng)
            blur_info[i] = round(streak_px, 2)
        np.savetxt(os.path.join(base, f"pose/{i}.txt"), c2w)
        Image.fromarray((rgb * 255).astype(np.uint8)).save(
            os.path.join(base, f"color/{i}.jpg"), quality=97)
        imageio.imwrite(os.path.join(base, f"depth/{i}.png"),
                        (z * 1000).astype(np.uint16))
        print(f"frame {i + 1}/{args.frames}", end="\r")
    if blur_ids:
        import json
        with open(os.path.join(args.out, args.scan, "blur_info.json"),
                  "w") as f:
            json.dump({"blurred_train_frames": blur_info,
                       "blur_deg": args.blur_deg,
                       "train_step": args.train_step}, f, indent=1)
        print(f"\nmotion-blurred {len(blur_ids)} of {len(train_ids)} "
              f"train frames: {blur_ids}")
    print(f"\nwrote {args.frames} frames to {base}")


if __name__ == "__main__":
    main()
