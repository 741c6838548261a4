"""Typed configuration for the TPU-native hybrid neural rendering framework.

The reference (CVMI-Lab/HybridNeuralRendering) drives everything through a flat
~150-flag argparse namespace assembled in two phases
(/root/reference/options/base_options.py:117-136) with per-scene bash presets
(/root/reference/dev_scripts/w_scannet_etf/scene241_full.sh).  Here the same
knobs become frozen dataclasses: one sub-config per subsystem, composed into a
single `Config`, with the canonical scene presets expressed as constructors.

Everything that determines *shapes* under jit (rays per batch, samples per ray,
neighbor counts, point capacity, voxel-grid capacity) lives here as static
Python ints so a single compiled executable serves the whole training run.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple


def _t3(x) -> Tuple[float, float, float]:
    a, b, c = x
    return (float(a), float(b), float(c))


@dataclass(frozen=True)
class QuerierConfig:
    """Voxel-grid ray->neighbor-point querier.

    Mirrors the hyperparameters of the reference CUDA querier
    (/root/reference/models/neural_points/query_point_indices_worldcoords.py:46-77
    and neural_points.py:13-230) but with static capacities so the whole query
    compiles to fixed-shape XLA: rays that miss are masked, never compacted.
    """

    # Base voxel size (world units) and integer scale -> query voxel = vsize*vscale.
    vsize: Tuple[float, float, float] = (0.008, 0.008, 0.008)
    vscale: Tuple[int, int, int] = (2, 2, 2)
    # Occupancy dilation half-width per axis (reference `kernel_size`, full width).
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    # Neighbor-voxel search region per axis (reference `query_size`, full width).
    query_size: Tuple[int, int, int] = (3, 3, 3)
    # Candidate samples per ray before occupancy culling (reference z_depth_dim).
    z_depth_dim: int = 400
    # Shading points kept per ray.
    SR: int = 24
    # Neighbor points kept per shading point.
    K: int = 8
    # Max points stored per voxel.
    P: int = 26
    # Max occupied voxels (compact table capacity).
    max_o: int = 610000
    # World-space AABB clip for the grid (xmin ymin zmin xmax ymax zmax).
    ranges: Tuple[float, float, float, float, float, float] = (
        -10.0, -10.0, -10.0, 10.0, 10.0, 10.0)
    # Linear voxel budget: grid dims are data (from the live point AABB) but the
    # dense grid buffer is this static capacity.
    grid_capacity: int = 48_000_000
    # Neighbor radius cap = radius_limit_scale * max(base vsize x, y) — the
    # reference scales the *unscaled* vsize (query_point_indices_worldcoords.py:75).
    radius_limit_scale: float = 4.0
    # Jitter fraction of a step during training ray sampling (reference 0.3).
    sample_jitter: float = 0.3
    # 'linear' | 'disparity' candidate spacing along the ray.
    sample_mode: str = "linear"
    # Supervoxel fast path: each kernel_size-dilated voxel stores ONE packed
    # bucket of every point in its whole kernel_size neighborhood, so the
    # per-sample K-NN is a single aligned row gather instead of 27 bucket
    # gathers + 9 occupancy-window gathers (the round-1 hot spot).  Exact in
    # the non-overflow regime (<= Ps points per neighborhood), same caveat as
    # the per-voxel buckets (SURVEY §7.3).
    supervoxel: bool = True
    # Max points per supervoxel (kernel_size-window) bucket.
    Ps: int = 64
    # Compact supervoxel-node capacity (kernel_size-dilated occupied voxels).
    max_nodes: int = 2_500_000

    @property
    def query_vsize(self) -> Tuple[float, float, float]:
        return tuple(v * s for v, s in zip(self.vsize, self.vscale))

    @property
    def radius_limit(self) -> float:
        return self.radius_limit_scale * max(self.vsize[0], self.vsize[1])


@dataclass(frozen=True)
class PointsConfig:
    """Neural point cloud layout (reference models/neural_points/neural_points.py:11-230)."""

    num_points: int = 800_000          # static capacity; live count is data
    feature_dim: int = 32              # reference point_features_dim
    color_mode: str = "1"              # '1': separate color fed to block3
    dir_mode: str = "1"
    conf_mode: str = "1"               # '1': conf multiplies aggregation weight
    xyz_grad: bool = False
    feat_grad: bool = True
    conf_grad: bool = True
    color_grad: bool = True
    dir_grad: bool = True
    feature_init_method: str = "rand"


@dataclass(frozen=True)
class AggregatorConfig:
    """The viewmlp shading network + hybrid image-feature fusion.

    Mirrors /root/reference/models/aggregators/point_aggregators.py:426-751
    (viewmlp_init) with scene241_full.sh values as defaults.
    """

    which_agg_model: str = "viewmlp"
    agg_distance_kernel: str = "linear"   # linear|quadric|numquadric|numlinear|avg|trilinear
    agg_dist_pers: int = 20               # 20 = concat(world delta, persp delta)
    agg_intrp_order: int = 2              # aggregate after per-point alpha
    agg_weight_norm: bool = True
    agg_axis_weight: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    apply_pnt_mask: bool = True
    act_type: str = "leaky_relu"          # LeakyReLU(0.01) in torch default
    act_super: bool = True                # mip-nerf stabilized activations

    point_features_dim: int = 32
    shading_feature_num: int = 256
    shading_feature_mlp_layer1: int = 2
    shading_feature_mlp_layer2: int = 0
    shading_feature_mlp_layer3: int = 2
    shading_alpha_mlp_layer: int = 1
    shading_color_mlp_layer: int = 4
    shading_color_channel_num: int = 3

    num_pos_freqs: int = 10
    num_viewdir_freqs: int = 4
    num_feat_freqs: int = 3
    dist_xyz_freq: int = 5
    dist_xyz_deno: float = 0.0

    agg_feat_xyz_mode: str = "None"
    agg_alpha_xyz_mode: str = "None"
    agg_color_xyz_mode: str = "None"
    point_color_mode: str = "1"   # '1': per-point color feeds block3
    point_dir_mode: str = "1"     # '1': per-point dir-delta feeds block3
    # 'bfloat16' runs the shading MLPs / CNN matmuls in bf16 on the MXU with
    # f32 master weights; 'float32' = full precision.  Measured ~neutral on
    # throughput (the step is gather/memory-bound), so f32 stays the default.
    compute_dtype: str = "float32"
    # 'bfloat16' runs the WHOLE image-pyramid chain — CNN convs, stage maps,
    # bilinear upsampling, the full-res feature table and its row gathers —
    # in bf16 end to end (f32 master weights; gather backward accumulates
    # in f32).  Unlike `compute_dtype` (per-matmul, casts back to f32
    # between ops), this halves the INTER-op HBM traffic of the hybrid
    # branch, whose 6/12/24-channel maps lane-pad to 128 so their cost is
    # layout bytes, not FLOPs.  Shipped default after the round-4 A/B:
    # burst step 160.2 -> 154.3 ms, blended bench +1.5%, fixture quality
    # equal-or-better (32.47 vs 31.89 dB PSNR at 2k steps).  tiny_test
    # pins float32 so CPU torch-parity tests stay exact.
    pyramid_dtype: str = "bfloat16"
    # 'bfloat16' runs the per-neighbor shading chain (PE concat onward:
    # block1/2/3 + alpha head) in bf16 END-TO-END — weights and
    # activations cast once at chain entry, K-aggregation and density
    # still accumulate in f32.  Unlike `compute_dtype` (per-matmul casts,
    # twice bench-neutral because the cast traffic eats the MXU gain),
    # this removes the bf16x3 packing copies and halves every
    # inter-layer activation.  Shipped default after the round-4 A/B:
    # ScanNet blended 24,786 -> 26,830 rays/s (+8.2%), NeRF SR=80
    # 8,771 -> 9,879 (+12.6%); fixture quality equal on both workloads
    # (32.42 vs 32.47 dB ScanNet; 27.44 vs 27.41 dB NeRF).  tiny_test
    # pins float32 so CPU torch-parity tests stay exact.
    shading_dtype: str = "bfloat16"
    # (A fused Pallas pass for the whole per-neighbor chain lived here in
    # round 2 behind a `fused_chain` knob — bench-neutral, retired to
    # tools/pallas_shading.py; see CLAUDE.md round-2 log.)
    # Rematerialize the per-neighbor MLP chain THROUGH the K-aggregation
    # (jax.checkpoint, nothing_saveable): the backward recomputes the
    # [R*SR*K, 256] activations instead of spilling them to HBM.  Required
    # for the NeRF-synthetic workload (R=3600, SR=80 -> 2.3M neighbor rows;
    # without it the train step needs ~25 GB of residuals and OOMs a v5e's
    # 16 GB).  Off for ScanNet shapes where residuals fit (remat measured
    # ~neutral-to--4% there, CLAUDE.md round-1 log).
    remat_chain: bool = False
    # Run the per-neighbor chain as a lax.scan over this many ray chunks
    # (1 = single pass).  Bounds the chain's LIVE temporaries — the remat
    # backward still peaks at several [R*SR*K, 256] buffers at once, and
    # XLA's T(8,128) tiling pads the [R,SR,K,small] tensors' last dim to 128
    # lanes (a [2.3M, 1] f32 temp costs 1.09 GB padded).  Chunks divide R.
    # A/B on the SR=80 NeRF workload (tools/ablate_nerf_chunks.py, r3):
    # 16 chunks 448 ms vs 8 chunks 508 ms (+13%) vs 4 ~485 — smaller live
    # windows pipeline better; presets use 16.
    chain_chunks: int = 1
    # Fused Linear+LeakyReLU custom VJP for the chain MLPs: the backward
    # rebuilds the activation mask from the layer OUTPUT's sign (leaky
    # preserves sign), so the pre-activation is never saved — the no-remat
    # chain's residual set halves to one tensor per layer (models/mlp.py
    # _linear_leaky).  Only active for act_type=leaky_relu.
    fused_leaky_vjp: bool = False
    # Unique-row dedup for the big attribute gather (VERDICT r4 #5): one
    # step's [R,SR,K] ids hit ~68k unique points of the 602k gather slots
    # on the canonical ScanNet workload (8.8x, 47x on NeRF — census in
    # PERF.md).  >0 = static unique-capacity of the compact table; the
    # gather falls back in-graph (lax.cond) to the direct path on
    # overflow, so results are exact at any setting.  Bench A/B (round 5):
    # pyramid-cached step 27,515 -> 28,455 rays/s (+3.4%) but CNN-burst
    # step -7% (the extra sort/int passes don't overlap with conv work),
    # so the renderer applies it only to the staged (cached) executable
    # unless dedup_uncached=True opts the other graphs in (see
    # models/neural_points.py _gather_rows_dedup).  Default on: blended
    # bench 26,772 -> 27,702 rays/s; the canonical step's unique count
    # (~68.6k) sits at 0.70x this cap, and the in-graph fallback keeps
    # any other workload exact (clamped to the slot count for small
    # fixtures).  BENCH_DEDUP=0 disables for A/Bs.
    dedup_gather: int = 98_304
    dedup_uncached: bool = False

    # Hybrid rendering (image-based branch).
    use_nearest: int = 4                  # number of nearby training views fused
    # Re-rank 1.5x nearest-view candidates by precomputed frame quality and
    # keep the best `use_nearest` (reference scannet_ft_dataset.py:777-795;
    # capability existed in data/nearest_views.py, now wired to config).
    select_high_quality: bool = False
    # Random view count per training batch (reference dynamic_nearest,
    # scannet_ft_dataset.py:763-768: V ~ randint(2, 8) at train, 4 at test).
    # TPU-native: the dataset always stacks `dynamic_nearest_pool` views so
    # batch shapes stay static; unused views are masked out of the fusion via
    # batch["view_mask"].
    dynamic_nearest: bool = False
    dynamic_nearest_pool: int = 8
    # Pyramid-cache sampling strategy: True materializes the 4 nearest views'
    # full-res feature maps from the cached stage maps each step (dense VPU
    # resize + ONE lane-aligned row gather); False gathers bilinear corners
    # per stage (48 tiny-row gathers).  Same math either way.
    staged_materialize: bool = True
    feature_guidance: bool = True         # 3D feature guides fusion weights
    use_delta_view: bool = True
    downweight_blurry_feats: bool = False  # multiply fusion weight by frame weight
    tradition_attention: bool = False      # QKV attention instead of weight MLP
    use_gumbel_softmax: bool = False
    frame_level_attention: bool = False
    mixup_mode: str = "partial"
    learn_residuals: bool = True
    dynamic_weight: bool = False
    separate_color_decoder: bool = False
    large_color_final_block: bool = False
    add_idx: bool = False                  # frame-phase (sin,cos) channels into aux CNN
    disable_viewdirs: bool = False
    disable_color_feature: bool = False

    # Train-time image-feature drop regularization.
    drop_ratio: float = 0.5
    random_position: int = 1              # 0: drop before fusion, 1: after
    ray_points: bool = True               # drop whole rays (vs per shading point)
    drop_patch: bool = True               # drop all rays of random patches

    # Learnable blur kernel predictor head (returned to the model layer).
    learnable_blur_kernel: bool = False
    learnable_blur_kernel_size: int = 9
    learnable_blur_kernel_mode: int = 4
    learnable_blur_kernel_conv: bool = False
    learnable_blur_kernel_norm: int = 0
    learnable_blur_patch_size: int = 8
    boundary_mode: int = 0

    sparse_loss_weight: float = 0.0

    @property
    def aux_feature_channels(self) -> int:
        """RGB + 3 CNN pyramid stages with channel expansion x2: 3*(1+2+4+8)=45."""
        e = 2
        return 3 * (1 + e + e ** 2 + e ** 3)

    @property
    def dist_dim(self) -> int:
        return (4 if self.agg_dist_pers == 30 else 6) if self.agg_dist_pers > 9 else 3


@dataclass(frozen=True)
class RenderConfig:
    """Volume rendering knobs (reference models/rendering/)."""

    which_ray_generation: str = "near_far_linear"
    which_render_func: str = "radiance"
    which_blend_func: str = "alpha"
    which_tonemap_func: str = "off"
    raydist_mode_unit: bool = True
    bg_color: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    near_plane: float = 0.1
    far_plane: float = 8.0
    # 'no' | 'img_plane': plane-background compositing.  When it ends with
    # 'plane' and the dataset provides plane_pnt/plane_normal/plane_color,
    # drivers precompute per-ray bg colors via core/bg_plane.compute_bg_ray
    # and the renderer composites them under the background transmission
    # (reference --bgmodel, options/base_options.py:54; disabled in every
    # shipped script).
    bgmodel: str = "no"


@dataclass(frozen=True)
class BlurConfig:
    """Blur-simulation module (reference models/base_rendering_model.py:677-1018
    + kernel bank generation data/scannet_ft_dataset.py:184-242)."""

    add_blur_sim: bool = False
    blur_kernel_version: int = 3          # 1 asym, 2 sym, 3 both
    blur_kernel_size: int = 9
    num_move_dirs: int = 8
    move_dists: Tuple[int, ...] = (1, 2, 4)
    learnable: bool = False

    @property
    def num_kernels(self) -> int:
        n_v1 = len(self.move_dists) * self.num_move_dirs
        n_v2 = len(self.move_dists) * (self.num_move_dirs // 2)
        if self.blur_kernel_version == 1:
            return n_v1
        if self.blur_kernel_version == 2:
            return n_v2
        return n_v1 + n_v2


@dataclass(frozen=True)
class SamplingConfig:
    """Pixel sampling for training batches (reference data/scannet_ft_dataset.py:893-950)."""

    random_sample: str = "dilated"        # patch|random|random2|dilated|no_crop
    random_sample_size: int = 56          # rays per side (R = size^2)
    dilation_patch_num: int = 7
    dilation_patch_size: int = 8
    dilation_max: int = 8
    dilation_min: int = 1
    edge_filter: int = 10                 # margin cropped at image edges
    # Rays per compiled chunk for full-frame eval/probe renders (0 = reuse the
    # training batch size).  The reference picks its own test chunk
    # (run/test_ft.py:322-329); a wide second executable cuts the ~98
    # sequential jit calls per 480x640 frame to ~19.
    eval_chunk_rays: int = 0

    @property
    def rays_per_batch(self) -> int:
        return self.random_sample_size ** 2

    @property
    def eval_rays(self) -> int:
        return self.eval_chunk_rays or self.rays_per_batch


@dataclass(frozen=True)
class LossConfig:
    """Loss items and weights (reference base_rendering_model.py:40-141 + preset)."""

    color_loss_items: Tuple[str, ...] = (
        "ray_masked_coarse_raycolor", "ray_miss_coarse_raycolor", "coarse_raycolor")
    color_loss_weights: Tuple[float, ...] = (1.0, 0.0, 0.0)
    zero_one_loss_items: Tuple[str, ...] = ("conf_coefficient",)
    zero_one_loss_weights: Tuple[float, ...] = (0.0001,)
    zero_epsilon: float = 1e-3
    sparse_loss_weight: float = 0.0
    use_frame_weight: bool = False
    # Exponent applied to the precomputed per-frame quality weight before it
    # scales the loss (reference scannet_ft_dataset.py:756-758; published
    # ablation knob, default 1.0 in the canonical scripts).
    weight_exp: float = 1.0


@dataclass(frozen=True)
class OptimConfig:
    """Three optimizer groups (reference mvs_points_volumetric_model.py:49-104)."""

    lr: float = 0.0005        # network params
    plr: float = 0.002        # neural-point params
    mvs_lr: float = 0.0005    # MVS nets (feed-forward mode only)
    lr_policy: str = "iter_exponential_decay"
    lr_decay_iters: int = 1_000_000
    lr_decay_exp: float = 0.1
    maximum_step: int = 200_000
    beta1: float = 0.9
    beta2: float = 0.999
    # Image-pyramid cache schedule.  The reference re-runs the aux CNN over
    # the 4 nearest views every step (point_aggregators.py:1059-1068 — SURVEY
    # hot-loop (c)); here per-view stage maps are cached on device and the CNN
    # trains in bursts: the first `pyramid_burst_steps` of every
    # `pyramid_cycle_steps` run uncached (gradients flow into the CNN), the
    # rest consume cached features; the cache invalidates when a burst ends.
    pyramid_cache: bool = True
    pyramid_cycle_steps: int = 400
    pyramid_burst_steps: int = 40
    # Two retired point-Adam variants (a flattened 1-D leaf layout and a
    # fused Pallas kernel, both measured slower than optax's fused lowering)
    # live in tools/pallas_adam.py with their parity tests — CLAUDE.md r3 log.


@dataclass(frozen=True)
class ProbeConfig:
    """Point growing / pruning ("probe holes", reference run/train_ft.py:450-569)."""

    prob_freq: int = 10_000
    prob_num_step: int = 100
    prob_thresh: float = 0.7
    prob_mul: float = 0.4
    prob_kernel_size: Tuple[int, ...] = (3, 3, 3, 1, 1, 1)
    prob_tiers: Tuple[int, ...] = (40_000, 120_000)
    prob_top: int = 1
    prune_thresh: float = -1.0
    prune_iter: int = -1
    prune_max_iter: int = 150_000
    far_thresh: float = -1.0


@dataclass(frozen=True)
class ParallelConfig:
    """Device-mesh layout. Rays are sharded over `data`; point cloud + params
    replicated (reference ceiling was torch DataParallel,
    neural_points_volumetric_model.py:165-167 — here it is a real SPMD mesh)."""

    data_axis: str = "data"
    mesh_shape: Optional[Tuple[int, ...]] = None   # None -> all devices on `data`
    compute_dtype: str = "float32"                  # bfloat16 for matmul-heavy paths


@dataclass(frozen=True)
class Config:
    name: str = "default"
    querier: QuerierConfig = field(default_factory=QuerierConfig)
    points: PointsConfig = field(default_factory=PointsConfig)
    agg: AggregatorConfig = field(default_factory=AggregatorConfig)
    render: RenderConfig = field(default_factory=RenderConfig)
    blur: BlurConfig = field(default_factory=BlurConfig)
    sampling: SamplingConfig = field(default_factory=SamplingConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    probe: ProbeConfig = field(default_factory=ProbeConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    image_hw: Tuple[int, int] = (480, 640)
    seed: int = 0

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


# ---------------------------------------------------------------------------
# Canonical scene presets (mirroring dev_scripts; see BASELINE.json configs).
# ---------------------------------------------------------------------------

def scannet_full(scan: str = "scene0241_01") -> Config:
    """ScanNet full pipeline: hybrid + blur-kernel bank + frame weights
    (dev_scripts/w_scannet_etf/scene241_full.sh)."""
    return Config(
        name=f"{scan}_full",
        querier=QuerierConfig(),
        agg=AggregatorConfig(),
        blur=BlurConfig(add_blur_sim=True),
        loss=LossConfig(use_frame_weight=True),
        sampling=SamplingConfig(eval_chunk_rays=16384),
    )


def scannet_hybrid(scan: str = "scene0241_01") -> Config:
    """Hybrid rendering, no blur sim / frame weights (scene241_hybrid.sh)."""
    return Config(
        name=f"{scan}_hybrid",
        blur=BlurConfig(add_blur_sim=False),
        loss=LossConfig(use_frame_weight=False),
        sampling=SamplingConfig(eval_chunk_rays=16384),
    )


def scannet_scene101(scan: str = "scene0101_04") -> Config:
    """scene0101_04 full pipeline (scene101_full.sh): identical to
    scene241_full except the larger point budget (max_o=2,000,000)."""
    base = scannet_full(scan)
    return base.replace(
        querier=dataclasses.replace(base.querier, max_o=2_000_000,
                                    Ps=32, max_nodes=6_000_000),
        points=PointsConfig(num_points=2_000_000),
    )


def scannet_learnable(scan: str = "scene0101_04") -> Config:
    """Learnable blur-kernel MLP variant, pinned to scene101-style settings
    (scene101_learnable.sh = scene101_full.sh with learnable_blur_kernel=1)."""
    base = scannet_scene101(scan)
    return base.replace(
        name=f"{scan}_learnable",
        agg=AggregatorConfig(learnable_blur_kernel=True),
        blur=BlurConfig(add_blur_sim=True, learnable=True),
    )


def scannet_livingroom(scan: str = "livingroom") -> Config:
    """livingroom_full.sh: scene241 settings with dilation_setup 7_8_1_6
    (dilation_max=6) and the symmetric-only blur-kernel bank (version 2)."""
    base = scannet_full(scan)
    return base.replace(
        sampling=dataclasses.replace(base.sampling, dilation_max=6),
        blur=BlurConfig(add_blur_sim=True, blur_kernel_version=2),
    )


def scannet_vangoroom(scan: str = "vangoroom") -> Config:
    """vangoroom_full.sh — identical settings to livingroom_full.sh."""
    return scannet_livingroom(scan)


def nerf_synth_points(scene: str = "lego") -> Config:
    """NeRF-synthetic point-only rendering (w_n360/lego_points.sh style):
    SR=80, 60x60 random rays, no image-based fusion, no blur."""
    return Config(
        name=f"{scene}_points",
        querier=QuerierConfig(
            vsize=(0.004, 0.004, 0.004), vscale=(2, 2, 2), SR=80, K=8, P=12,
            max_o=410_000, z_depth_dim=400,
            ranges=(-0.721, -0.695, -0.995, 0.658, 0.706, 1.50),
            grid_capacity=24_000_000),
        points=PointsConfig(num_points=500_000),
        agg=AggregatorConfig(use_nearest=0, drop_ratio=0.0,
                             remat_chain=True, chain_chunks=16),
        render=RenderConfig(near_plane=2.0, far_plane=6.0),
        sampling=SamplingConfig(random_sample="random", random_sample_size=60,
                                eval_chunk_rays=4096),
        blur=BlurConfig(add_blur_sim=False),
        image_hw=(800, 800),
    )


def nerf_synth_hybrid(scene: str = "chair") -> Config:
    """NeRF-synthetic with hybrid image-based aggregation (w_n360/chair_hybrid.sh)."""
    cfg = nerf_synth_points(scene)
    return cfg.replace(
        name=f"{scene}_hybrid",
        agg=AggregatorConfig(use_nearest=4, drop_ratio=0.5,
                             remat_chain=True, chain_chunks=16),
        sampling=SamplingConfig(random_sample="dilated", random_sample_size=56,
                                eval_chunk_rays=4096),
    )


def fixture_nerf_points(scan: str = "objsim") -> Config:
    """The nerf_synth_points pipeline (SR=80, white bg, 60x60 random rays,
    ply bootstrap) fitted to the analytic object fixture
    (tools/make_fixture_scene.py --layout blender): canonical NeRF-synthetic
    workload shapes, fixture-scene geometry/capacities/resolution."""
    base = nerf_synth_points(scan)
    return base.replace(
        name=f"{scan}_points",
        querier=dataclasses.replace(
            base.querier, ranges=(-1.0, -1.0, -1.0, 1.0, 1.0, 1.0),
            grid_capacity=20_000_000, max_o=410_000, max_nodes=1_200_000),
        image_hw=(400, 400),
    )


def fixture_nerf_hybrid(scan: str = "objsim") -> Config:
    """nerf_synth_hybrid (SR=80, dilated rays, 4-view fusion) on the object
    fixture."""
    base = fixture_nerf_points(scan)
    return base.replace(
        name=f"{scan}_hybrid",
        agg=AggregatorConfig(use_nearest=4, drop_ratio=0.5,
                             remat_chain=True, chain_chunks=16),
        sampling=SamplingConfig(random_sample="dilated", random_sample_size=56,
                                eval_chunk_rays=4096),
    )


def fixture_room(scan: str = "roomsim") -> Config:
    """The scannet_full pipeline (hybrid + blur bank + frame weights) fitted
    to the analytic room scene tools/make_fixture_scene.py generates —
    used for end-to-end driver runs and quality evidence where real ScanNet
    scans are unavailable (PARITY.md).  Canonical vsize/SR/K/P retained;
    only scene geometry/capacities/resolution differ."""
    base = scannet_full(scan)
    return base.replace(
        name=f"{scan}_full",
        querier=dataclasses.replace(
            base.querier, ranges=(-2.0, -1.5, -0.5, 2.0, 1.5, 3.6),
            grid_capacity=14_000_000, max_o=400_000,
            Ps=32, max_nodes=2_500_000),
        points=PointsConfig(num_points=400_000),
        render=RenderConfig(near_plane=0.1, far_plane=4.5),
        image_hw=(240, 320),
    )


def tiny_test() -> Config:
    """Small everything — CPU-testable shapes for unit tests."""
    return Config(
        name="tiny",
        querier=QuerierConfig(
            vsize=(0.05, 0.05, 0.05), vscale=(2, 2, 2), SR=6, K=4, P=8,
            max_o=4096, z_depth_dim=32, grid_capacity=200_000,
            ranges=(-2.0, -2.0, -2.0, 2.0, 2.0, 2.0),
            Ps=32, max_nodes=60_000),
        points=PointsConfig(num_points=2048, feature_dim=8),
        agg=AggregatorConfig(
            point_features_dim=8, shading_feature_num=128, use_nearest=2,
            num_feat_freqs=2, dist_xyz_freq=2, drop_ratio=0.5,
            # f32 pyramid/shading so CPU parity/equality tests compare
            # exactly; TestPyramidDtype + the shading_dtype tests cover
            # the bf16 chains explicitly
            pyramid_dtype="float32", shading_dtype="float32"),
        render=RenderConfig(near_plane=0.1, far_plane=4.0),
        sampling=SamplingConfig(
            random_sample="dilated", random_sample_size=8,
            dilation_patch_num=2, dilation_patch_size=4, edge_filter=0),
        blur=BlurConfig(add_blur_sim=True, blur_kernel_size=5, move_dists=(1, 2)),
        image_hw=(48, 64),
    )


def apply_blur_overrides(cfg: Config, blur_mode: str = "preset",
                         frame_weight: int = -1) -> Config:
    """CLI-level overrides for the blur-handling A/B/C matrix
    (reference dev_scripts differ from each other in exactly these flags:
    add_blur_sim / learnable_blur_kernel / use_frame_weight — SURVEY §5
    config system).  blur_mode: 'preset' keeps the preset's setting;
    'off'/'bank'/'learnable' force the respective simulation.  frame_weight:
    -1 preset, 0 off, 1 on."""
    if blur_mode == "off":
        cfg = cfg.replace(
            blur=dataclasses.replace(cfg.blur, add_blur_sim=False,
                                     learnable=False),
            agg=dataclasses.replace(cfg.agg, learnable_blur_kernel=False))
    elif blur_mode == "bank":
        cfg = cfg.replace(
            blur=dataclasses.replace(cfg.blur, add_blur_sim=True,
                                     learnable=False),
            agg=dataclasses.replace(cfg.agg, learnable_blur_kernel=False))
    elif blur_mode == "learnable":
        cfg = cfg.replace(
            blur=dataclasses.replace(cfg.blur, add_blur_sim=True,
                                     learnable=True),
            agg=dataclasses.replace(cfg.agg, learnable_blur_kernel=True))
    elif blur_mode != "preset":
        raise KeyError(f"unknown blur_mode {blur_mode}")
    if frame_weight >= 0:
        cfg = cfg.replace(loss=dataclasses.replace(
            cfg.loss, use_frame_weight=bool(frame_weight)))
    return cfg


PRESETS = {
    "scannet_full": scannet_full,
    "scannet_hybrid": scannet_hybrid,
    "scannet_learnable": scannet_learnable,
    "scannet_scene101": scannet_scene101,
    "scannet_livingroom": scannet_livingroom,
    "scannet_vangoroom": scannet_vangoroom,
    "nerf_synth_points": nerf_synth_points,
    "nerf_synth_hybrid": nerf_synth_hybrid,
    "fixture_nerf_points": fixture_nerf_points,
    "fixture_nerf_hybrid": fixture_nerf_hybrid,
    "fixture_room": fixture_room,
    "tiny": tiny_test,
}
