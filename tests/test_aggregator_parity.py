"""Full viewmlp aggregator parity against the reference PointAggregator.

The reference class is instantiated on torch CPU (SH module stubbed — modern
scipy dropped sph_harm), OUR initialized parameters are copied into its
tensors layer by layer, and both sides shade the same all-valid inputs.  The
decoded (sigma, rgb) per sample must match to float tolerance — end-to-end
evidence that the TPU re-design computes the reference's function.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

# stub utils.spherical before the aggregator import (only sh_intrp needs it)
if "utils.spherical" not in sys.modules:
    stub = types.ModuleType("utils.spherical")

    class _SH:  # pragma: no cover - never called on the linear kernel path
        def __init__(self, *a, **k):
            pass

    stub.SphericalHarm = _SH
    stub.SphericalHarm_table = _SH
    sys.modules["utils.spherical"] = stub

try:
    from models.aggregators.point_aggregators import PointAggregator  # noqa: E402
    HAVE_REF = True
except Exception:  # pragma: no cover
    HAVE_REF = False

pytestmark = pytest.mark.skipif(not HAVE_REF,
                                reason="reference aggregator unavailable")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from hybridneuralrendering_tpu import config as C  # noqa: E402
from hybridneuralrendering_tpu.models import aggregator as agg  # noqa: E402


F_NUM = 128       # shading_feature_num (partial mixup needs F/2 > 45)
PF_DIM = 8        # point_features_dim
V = 2             # nearest views
R, SR, K = 6, 4, 3
H = W = 24


def make_opt():
    o = types.SimpleNamespace()
    o.which_agg_model = "viewmlp"
    o.act_type = "LeakyReLU"
    o.act_super = 1
    o.point_hyper_dim = PF_DIM
    o.agg_distance_kernel = "linear"
    o.agg_dist_pers = 20
    o.agg_intrp_order = 2
    o.agg_weight_norm = 1
    o.agg_axis_weight = None
    o.apply_pnt_mask = 1
    o.agg_feat_xyz_mode = "None"
    o.agg_alpha_xyz_mode = "None"
    o.agg_color_xyz_mode = "None"
    o.num_pos_freqs = 0
    o.num_viewdir_freqs = 4
    o.view_ori = 0
    o.num_feat_freqs = 2
    o.dist_xyz_freq = 2
    o.dist_xyz_deno = 0.0
    o.point_features_dim = PF_DIM
    o.shading_feature_num = F_NUM
    o.shading_feature_mlp_layer1 = 2
    o.shading_feature_mlp_layer2 = 0
    o.shading_feature_mlp_layer3 = 2
    o.shading_alpha_mlp_layer = 1
    o.shading_color_mlp_layer = 4
    o.shading_color_channel_num = 3
    o.point_color_mode = "1"
    o.point_dir_mode = "1"
    o.use_nearest = V
    o.feature_guidance = 1
    o.use_delta_view = 1
    o.tradition_attention = 0
    o.refine_blend = 0
    o.mixup_mode = "partial"
    o.learn_residuals = 1
    o.dynamic_weight = 0
    o.downweight_blurry_feats = 0
    o.separate_color_decoder = 0
    o.large_color_final_block = 0
    o.use_2D_CNN = 0
    o.add_idx = 0
    o.dynamic_nearest = 0
    o.disable_viewdirs = 0
    o.disable_color_feature = 0
    o.drop_ratio = 0.0
    o.drop_disturb_range = 0
    o.random_position = 1
    o.ray_points = 1
    o.drop_patch = 1
    o.patch_drop = 1
    o.dilation_setup = "2_4_1_2"
    o.search_size = 0
    o.search_dilation = 0
    o.exp_aggregation = 0
    o.learnable_blur_kernel = 0
    o.learnable_blur_kernel_conv = 0
    o.learnable_blur_kernel_size = 9
    o.learnable_blur_kernel_mode = 4
    o.learnable_blur_patch_size = 8
    o.sparse_loss_weight = 1.0   # keep weight/conf outputs for comparison
    o.zero_one_loss_items = ["conf_coefficient"]
    o.prob = 0
    o.is_train = False
    o.sh_degree = 4
    o.sh_act = "sigmoid"
    o.sh_dist_func = "sh_linear"
    o.weight_xyz_freq = 2
    o.weight_feat_dim = 8
    o.use_gumbel_softmax = 0
    o.frame_level_attention = 0
    return o


def our_cfg():
    return C.AggregatorConfig(
        point_features_dim=PF_DIM, shading_feature_num=F_NUM,
        num_feat_freqs=2, dist_xyz_freq=2, use_nearest=V, drop_ratio=0.0,
        num_viewdir_freqs=4,
        # torch parity compares f32 math exactly; the bf16 chain defaults
        # are gated separately (tests/test_train.py dtype tests)
        pyramid_dtype="float32", shading_dtype="float32")


def copy_linear(seq_layer, p):
    seq_layer.weight.data = torch.from_numpy(np.asarray(p["w"]).T.copy())
    seq_layer.bias.data = torch.from_numpy(np.asarray(p["b"]).copy())


def copy_mlp(seq, layers):
    lin = [m for m in seq if isinstance(m, torch.nn.Linear)]
    assert len(lin) == len(layers), (len(lin), len(layers))
    for sl, p in zip(lin, layers):
        copy_linear(sl, p)


def copy_conv(conv, p):
    # HWIO -> OIHW
    conv.weight.data = torch.from_numpy(
        np.asarray(p["w"]).transpose(3, 2, 0, 1).copy())
    conv.bias.data = torch.from_numpy(np.asarray(p["b"]).copy())


def copy_params_to_ref(ref: "PointAggregator", params):
    a = params["aggregator"]
    copy_mlp(ref.block1, a["block1"])
    copy_mlp(ref.block3, a["block3"])
    copy_mlp(ref.alpha_branch, a["alpha"])
    copy_mlp(ref.color_branch, a["color"])
    copy_mlp(ref.color_feature_branch, a["color_feature"])
    copy_mlp(ref.aux_merge_weight_block, a["fusion_weight"])
    copy_mlp(ref.color_mixup_block, a["mixup"])
    copy_mlp(ref.color_final_block, a["color_final"])
    pyr = a["pyramid"]
    convs1 = [m for m in ref.aux_block_s1 if isinstance(m, torch.nn.Conv2d)]
    convs2 = [m for m in ref.aux_block_s2 if isinstance(m, torch.nn.Conv2d)]
    convs3 = [m for m in ref.aux_block_s3 if isinstance(m, torch.nn.Conv2d)]
    copy_conv(convs1[0], pyr["s1a"])
    copy_conv(convs1[1], pyr["s1b"])
    copy_conv(convs2[0], pyr["s2a"])
    copy_conv(convs2[1], pyr["s2b"])
    copy_conv(convs3[0], pyr["s3a"])
    copy_conv(convs3[1], pyr["s3b"])


class TestAggregatorParity:
    def test_full_viewmlp_outputs_match(self):
        opt = make_opt()
        ref = PointAggregator(opt)
        ref.eval()

        cfg = our_cfg()
        params = {"aggregator": agg.init(jax.random.PRNGKey(0), cfg)}
        copy_params_to_ref(ref, params)

        rng = np.random.default_rng(0)
        f32 = np.float32
        sampled_xyz = rng.uniform(-1, 1, (1, R, SR, K, 3)).astype(f32)
        sample_loc_w = rng.uniform(-1, 1, (1, R, SR, 3)).astype(f32)
        sampled_xyz_pers = rng.uniform(0.1, 1, (1, R, SR, K, 3)).astype(f32)
        sample_loc = rng.uniform(0.1, 1, (1, R, SR, 3)).astype(f32)
        sampled_embedding = rng.normal(size=(1, R, SR, K, PF_DIM)).astype(f32)
        sampled_color = rng.uniform(0, 1, (1, R, SR, K, 3)).astype(f32)
        sampled_dir = rng.normal(size=(1, R, SR, K, 3)).astype(f32)
        sampled_dir /= np.linalg.norm(sampled_dir, axis=-1, keepdims=True)
        sampled_conf = rng.uniform(0.2, 1, (1, R, SR, K, 1)).astype(f32)
        pnt_mask = np.ones((1, R, SR, K), bool)
        ray_dirs = rng.normal(size=(1, R, SR, 3)).astype(f32)
        ray_dirs /= np.linalg.norm(ray_dirs, axis=-1, keepdims=True)
        vsize = (0.016, 0.016, 0.016)
        img_n = rng.uniform(0, 1, (1, V, H, W, 3)).astype(f32)
        # integer-centered projections (the reference gathers nearest pixel)
        loc_i = rng.integers(2, W - 2, (V, R, SR, 2)).astype(f32) + 0.3
        delta_v = rng.normal(size=(V, R, SR, 3)).astype(f32) * 0.1

        with torch.no_grad():
            t_out, t_valid, t_weight, t_conf = ref(
                torch.from_numpy(sampled_color),
                torch.eye(3),
                torch.from_numpy(sampled_dir),
                torch.from_numpy(sampled_conf),
                torch.from_numpy(sampled_embedding),
                torch.from_numpy(sampled_xyz_pers),
                torch.from_numpy(sampled_xyz),
                torch.from_numpy(pnt_mask),
                torch.from_numpy(sample_loc),
                torch.from_numpy(sample_loc_w),
                torch.from_numpy(ray_dirs),
                vsize, 0.008,
                aux_image=None, pixel_idx=None,
                img_n=torch.from_numpy(img_n),
                vid_angle_n=None,
                sample_loc_i_n=torch.from_numpy(loc_i),
                delta_viewdir_n=torch.from_numpy(delta_v),
                frame_weight_n=torch.ones(1, V))

        # our side: precompute the pyramid features like the renderer does
        from hybridneuralrendering_tpu.models import feature_pyramid
        img_feat = feature_pyramid.apply(
            params["aggregator"]["pyramid"], jnp.asarray(img_n[0]),
            cfg.act_type)
        out = agg.apply(
            params["aggregator"], cfg,
            sampled_xyz=jnp.asarray(sampled_xyz[0]),
            sampled_xyz_pers=jnp.asarray(sampled_xyz_pers[0]),
            sampled_embedding=jnp.asarray(sampled_embedding[0]),
            sampled_color=jnp.asarray(sampled_color[0]),
            sampled_dir=jnp.asarray(sampled_dir[0]),
            sampled_conf=jnp.asarray(sampled_conf[0, ..., 0]),
            pnt_mask=jnp.asarray(pnt_mask[0]),
            sample_loc=jnp.asarray(sample_loc[0]),
            sample_loc_w=jnp.asarray(sample_loc_w[0]),
            sample_ray_dirs=jnp.asarray(ray_dirs[0]),
            vsize=vsize,
            img_feat_n=img_feat,
            sample_loc_i_n=jnp.asarray(loc_i),
            delta_viewdir_n=jnp.asarray(delta_v),
            frame_weight_n=jnp.ones(V),
            train=False)

        t_np = t_out.numpy()[0]
        j_np = np.asarray(out.features)
        np.testing.assert_allclose(j_np, t_np, rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(out.weight),
                                   t_weight.numpy().reshape(R, SR, K),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out.conf_coefficient),
                                   t_conf.numpy().reshape(R, SR, K),
                                   rtol=1e-4, atol=1e-6)
