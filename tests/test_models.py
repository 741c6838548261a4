"""Model-layer tests: aggregator, blur module, losses, end-to-end renderer."""

import jax
import jax.numpy as jnp
import numpy as np

from hybridneuralrendering_tpu import config as C
from hybridneuralrendering_tpu.models import aggregator as agg
from hybridneuralrendering_tpu.models import blur, losses
from hybridneuralrendering_tpu.models import neural_points as npts
from hybridneuralrendering_tpu.models import renderer
from hybridneuralrendering_tpu.ops import query as Q
from hybridneuralrendering_tpu.ops import voxel_grid as VG


def tiny():
    return C.tiny_test()


def make_scene(cfg, n=800, seed=0):
    rng = np.random.default_rng(seed)
    xyz = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    points = npts.init_from_arrays(
        xyz, cfg.points,
        conf=rng.uniform(0.3, 1.0, (n, 1)),
        color=rng.uniform(0, 1, (n, 3)),
        dirs=rng.normal(size=(n, 3)),
        key=jax.random.PRNGKey(seed))
    geom = VG.compute_grid_geometry(xyz, np.ones(n, bool), cfg.querier)
    grid = VG.build_grid(points.xyz, points.mask, geom, cfg.querier)
    return points, grid


def make_batch(cfg, seed=1):
    rng = np.random.default_rng(seed)
    R = cfg.sampling.rays_per_batch
    V = max(cfg.agg.use_nearest, 1)
    H, W = cfg.image_hw
    campos = np.array([0.0, 0.0, -3.0], np.float32)
    targets = rng.uniform(-0.5, 0.5, (R, 3)).astype(np.float32)
    dirs = targets - campos
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    intr = np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]], np.float32)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = campos
    batch = {
        "campos": jnp.asarray(campos),
        "camrotc2w": jnp.eye(3),
        "raydir": jnp.asarray(dirs),
        "bg_color": jnp.asarray([1.0, 1.0, 1.0]),
        "gt_image": jnp.asarray(rng.uniform(0, 1, (R, 3)).astype(np.float32)),
        "images_nearest": jnp.asarray(
            rng.uniform(0, 1, (V, H, W, 3)).astype(np.float32)),
        "c2w_nearest": jnp.asarray(np.stack([c2w] * V)),
        "campos_nearest": jnp.asarray(np.stack([campos] * V)),
        "intrinsic_nearest": jnp.asarray(intr),
        "frame_weight_nearest": jnp.ones((V,)),
    }
    return batch


class TestGatherRowsVJP:
    def test_matches_scatter_add_ground_truth(self):
        """The sorted-cumsum custom VJP of the stacked attribute gather must
        equal XLA's scatter-add gradient of a plain table[idx] gather, with
        duplicate indices, absent rows, and zero-cotangent slots."""
        rng = np.random.default_rng(7)
        n, f = 97, 6
        table = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
        # duplicates + many absent rows + index 0 repeated (the clamp target)
        idx = jnp.asarray(rng.integers(0, n, size=(11, 4, 3)).astype(np.int32))
        idx = idx.at[0].set(0)
        ct = jnp.asarray(rng.normal(size=(11, 4, 3, f)).astype(np.float32))
        ct = ct.at[3].set(0.0)

        def via_custom(t):
            return jnp.sum(npts._gather_rows(t, idx) * ct)

        def via_plain(t):
            return jnp.sum(t[idx] * ct)

        g_custom = jax.grad(via_custom)(table)
        g_plain = jax.grad(via_plain)(table)
        np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_plain),
                                   rtol=2e-4, atol=1e-5)
        # absent rows get an exact zero (not cancellation noise)
        present = np.zeros(n, bool)
        present[np.asarray(idx).reshape(-1)] = True
        assert np.all(np.asarray(g_custom)[~present] == 0.0)

    def test_dedup_gather_values_and_grads_exact(self):
        """_gather_rows_dedup (unique-row compact table + int expansion,
        VERDICT r4 #5) must reproduce the direct gather bit-for-bit in the
        forward and match the plain-gather gradient, for u_cap above the
        unique count, exactly AT it, and BELOW it (overflow -> in-graph
        direct fallback)."""
        rng = np.random.default_rng(11)
        n, f = 131, 5
        table = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
        # heavy duplication like the real [R,SR,K] ids: 29 unique ids
        pool = rng.choice(n, size=29, replace=False)
        idx = jnp.asarray(rng.choice(pool, size=(9, 5, 4)).astype(np.int32))
        ct = jnp.asarray(rng.normal(size=(9, 5, 4, f)).astype(np.float32))
        n_unique = len(np.unique(np.asarray(idx)))
        direct = np.asarray(table)[np.asarray(idx)]

        for u_cap in (n_unique + 40, n_unique, n_unique - 5):
            out = npts._gather_rows_dedup(table, idx, u_cap)
            np.testing.assert_array_equal(np.asarray(out), direct)

            def via_dedup(t, u=u_cap):
                return jnp.sum(npts._gather_rows_dedup(t, idx, u) * ct)

            g_dedup = jax.grad(via_dedup)(table)
            g_plain = jax.grad(lambda t: jnp.sum(t[idx] * ct))(table)
            np.testing.assert_allclose(np.asarray(g_dedup),
                                       np.asarray(g_plain),
                                       rtol=2e-4, atol=1e-5)

    def test_dedup_gather_jits_and_matches_full_gather_api(self):
        """gather(..., dedup=U) equals gather(...) through the public API
        under jit (the renderer calls it inside the train step)."""
        cfg = C.PointsConfig(num_points=64, feature_dim=8)
        rng = np.random.default_rng(3)
        pts = npts.init_from_arrays(
            rng.uniform(-1, 1, (64, 3)).astype(np.float32), cfg,
            conf=rng.uniform(0.3, 1.0, (64, 1)),
            color=rng.uniform(0, 1, (64, 3)),
            dirs=rng.normal(size=(64, 3)),
            key=jax.random.PRNGKey(0))
        pidx = jnp.asarray(rng.integers(-1, 64, size=(7, 3, 2)).astype(
            np.int32))

        base = jax.jit(lambda p, i: npts.gather(p, i))(pts, pidx)
        dd = jax.jit(lambda p, i: npts.gather(p, i, dedup=48))(pts, pidx)
        for a, b in zip(base[:5], dd[:5]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestAggregatorUnits:
    def test_gradient_clamp_straight_through(self):
        f = lambda c: jnp.sum(agg.gradient_clamp(c) * 2.0)
        g = jax.grad(f)(jnp.asarray([0.5, -0.3, 1.7]))
        np.testing.assert_allclose(np.asarray(g), 2.0)
        v = agg.gradient_clamp(jnp.asarray([0.5, -0.3, 1.7]))
        np.testing.assert_allclose(np.asarray(v), [0.5, 0.0001, 1.0],
                                   rtol=1e-3)

    def test_linear_weight_normalized(self):
        d = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3, 4, 6)))
        m = jnp.ones((2, 3, 4), bool)
        w = agg.dist_weight("linear", d, m)
        w = w / jnp.maximum(jnp.sum(w, -1, keepdims=True), 1e-8)
        np.testing.assert_allclose(np.asarray(jnp.sum(w, -1)), 1.0, rtol=1e-5)

    def test_masked_neighbors_get_zero_weight(self):
        d = jnp.ones((1, 1, 4, 6))
        m = jnp.asarray([[[True, True, False, False]]])
        w = np.asarray(agg.dist_weight("linear", d, m))
        assert (w[..., 2:] == 0).all() and (w[..., :2] > 0).all()

    def test_drop_ray_mask_matches_reference_rule(self):
        cfg = tiny().agg
        # patch_num=2, patch_size=4 -> 64 rays, 4 patches, ratio 0.5 -> 2 drop
        m = agg.drop_ray_mask(cfg, 64, 2, 4)
        assert m.sum() == 2 * 16
        flag = m.reshape(8, 8)
        assert flag[:4, :].all() and not flag[4:, :].any()

    def test_dists_mode_20_layout(self):
        cfg = tiny().agg
        rng = np.random.default_rng(0)
        sx = jnp.asarray(rng.normal(size=(2, 3, 4, 3)))
        sxp = jnp.asarray(rng.normal(size=(2, 3, 4, 3)))
        loc = jnp.asarray(rng.normal(size=(2, 3, 3)))
        locw = jnp.asarray(rng.normal(size=(2, 3, 3)))
        rd = jnp.asarray(rng.normal(size=(2, 3, 3)))
        d = agg.build_dists(cfg, sx, sxp, loc, locw, rd)
        assert d.shape == (2, 3, 4, 6)
        np.testing.assert_allclose(
            np.asarray(d[..., :3]), np.asarray(sx - locw[..., None, :]),
            rtol=1e-5)


class TestBlur:
    def test_kernel_bank_counts_and_norm(self):
        cfg = C.BlurConfig(add_blur_sim=True, blur_kernel_version=3,
                           blur_kernel_size=9, num_move_dirs=8,
                           move_dists=(1, 2, 4))
        bank = blur.generate_kernel_bank(cfg)
        assert bank.shape == (36, 9, 9)
        np.testing.assert_allclose(bank.sum(axis=(1, 2)), 1.0, rtol=1e-5)

    def test_kernel_bank_zeroed_when_disabled(self):
        cfg = C.BlurConfig(add_blur_sim=False)
        assert blur.generate_kernel_bank(cfg).sum() == 0

    def test_patch_roundtrip(self):
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.normal(size=(8 * 8, 3)).astype(np.float32))
        p = blur.to_patches(img, 2, 4)
        back = blur.from_patches(p, 2, 4)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(img))

    def test_bank_identity_when_gt_equals_render(self):
        """If GT == rendered, the identity candidate wins -> output unchanged."""
        cfg = C.BlurConfig(add_blur_sim=True, blur_kernel_size=5,
                           move_dists=(1, 2), num_move_dirs=8)
        bank = jnp.asarray(blur.generate_kernel_bank(cfg))
        rng = np.random.default_rng(1)
        img = jnp.asarray(rng.uniform(0, 1, (64, 3)).astype(np.float32))
        out = blur.blur_bank_update(img, img, bank, 2, 4)
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)

    def test_bank_blur_recovers_blurry_gt(self):
        """A GT made by blurring the render should be matched better than
        identity."""
        cfg = C.BlurConfig(add_blur_sim=True, blur_kernel_size=5,
                           move_dists=(2,), num_move_dirs=4)
        bank = jnp.asarray(blur.generate_kernel_bank(cfg))
        rng = np.random.default_rng(2)
        img = jnp.asarray(rng.uniform(0, 1, (256, 3)).astype(np.float32))
        gt = blur.blur_bank_update(img, jnp.zeros_like(img), bank[:1], 2, 8)
        # degrade toward that blurred gt
        out = blur.blur_bank_update(img, gt, bank, 2, 8)
        d_out = float(jnp.abs(out - gt).sum())
        d_id = float(jnp.abs(img - gt).sum())
        assert d_out <= d_id

    def test_learnable_blur_shapes_and_grad(self):
        cfg = tiny().agg
        cfg = C.AggregatorConfig(
            **{**cfg.__dict__, "learnable_blur_kernel": True,
               "learnable_blur_patch_size": 4, "learnable_blur_kernel_size": 3})
        params = agg.init(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.uniform(0, 1, (64, 3)).astype(np.float32))
        gt = jnp.asarray(rng.uniform(0, 1, (64, 3)).astype(np.float32))

        def loss_fn(p, x):
            out = blur.learnable_blur_update(p, cfg, x, gt, 2, 4)
            return jnp.mean((out - gt) ** 2)

        val, grads = jax.value_and_grad(loss_fn)(params, img)
        assert np.isfinite(float(val))
        gnorm = sum(float(jnp.abs(g).sum())
                    for g in jax.tree_util.tree_leaves(grads["blur_kernel"]))
        assert gnorm > 0


class TestLosses:
    def test_masked_matches_dense_when_all_masked(self):
        rng = np.random.default_rng(0)
        pred = jnp.asarray(rng.normal(size=(10, 3)).astype(np.float32))
        gt = jnp.asarray(rng.normal(size=(10, 3)).astype(np.float32))
        full = losses.masked_l2(pred, gt, jnp.ones(10, bool))
        np.testing.assert_allclose(float(full),
                                   float(jnp.mean((pred - gt) ** 2)), rtol=1e-6)

    def test_compute_losses_items(self):
        cfg = C.LossConfig()
        R = 16
        rng = np.random.default_rng(1)
        out = {
            "coarse_raycolor": jnp.asarray(
                rng.uniform(0, 1, (R, 3)).astype(np.float32)),
            "ray_mask": jnp.asarray(rng.random(R) > 0.5),
            "conf_coefficient": jnp.asarray(
                rng.uniform(0, 1, (R, 4, 2)).astype(np.float32)),
        }
        gt = jnp.asarray(rng.uniform(0, 1, (R, 3)).astype(np.float32))
        total, items = losses.compute_losses(out, gt, cfg)
        assert np.isfinite(float(total))
        assert "loss_ray_masked_coarse_raycolor" in items
        assert "loss_conf_coefficient" in items

    def test_frame_weight_scales_color_only(self):
        cfg = C.LossConfig(zero_one_loss_items=(), use_frame_weight=True)
        R = 8
        out = {"coarse_raycolor": jnp.zeros((R, 3)),
               "ray_mask": jnp.ones(R, bool)}
        gt = jnp.ones((R, 3))
        t1, _ = losses.compute_losses(out, gt, cfg, frame_weight=1.0)
        t2, _ = losses.compute_losses(out, gt, cfg, frame_weight=0.5)
        np.testing.assert_allclose(float(t2), float(t1) * 0.5, rtol=1e-5)


class TestRenderer:
    def test_forward_shapes_and_finiteness(self):
        cfg = tiny()
        points, grid = make_scene(cfg)
        batch = make_batch(cfg)
        params = renderer.init_params(jax.random.PRNGKey(0), cfg)
        out = renderer.render(params, points, grid, batch, cfg,
                              key=jax.random.PRNGKey(1), train=True)
        R = cfg.sampling.rays_per_batch
        assert out["coarse_raycolor"].shape == (R, 3)
        assert out["ray_mask"].shape == (R,)
        assert np.isfinite(np.asarray(out["coarse_raycolor"])).all()
        assert bool(np.asarray(out["ray_mask"]).any())

    def test_miss_rays_render_background(self):
        cfg = tiny()
        points, grid = make_scene(cfg)
        batch = make_batch(cfg)
        # aim all rays away from the cloud
        batch["raydir"] = jnp.asarray(
            np.tile([[0.0, 0.0, -1.0]], (cfg.sampling.rays_per_batch, 1))
            .astype(np.float32))
        params = renderer.init_params(jax.random.PRNGKey(0), cfg)
        out = renderer.render(params, points, grid, batch, cfg)
        assert not bool(np.asarray(out["ray_mask"]).any())
        expect = np.tile(np.asarray(batch["bg_color"])[None],
                         (cfg.sampling.rays_per_batch, 1))
        np.testing.assert_allclose(np.asarray(out["coarse_raycolor"]),
                                   expect, atol=1e-5)

    def test_grad_flows_to_points_and_params(self):
        cfg = tiny()
        points, grid = make_scene(cfg)
        batch = make_batch(cfg)
        params = renderer.init_params(jax.random.PRNGKey(0), cfg)

        def loss_fn(params, embedding):
            pts = points._replace(embedding=embedding)
            out = renderer.render(params, pts, grid, batch, cfg, train=True,
                                  key=jax.random.PRNGKey(2))
            return losses.compute_losses(out, batch["gt_image"], cfg.loss)[0]

        val, (gp, ge) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            params, points.embedding)
        assert np.isfinite(float(val))
        assert float(jnp.abs(ge).sum()) > 0
        for name in ["block1", "alpha", "color_feature", "mixup",
                     "fusion_weight", "color_final"]:
            leaf_sum = sum(float(jnp.abs(g).sum()) for g in
                           jax.tree_util.tree_leaves(gp["aggregator"][name]))
            assert leaf_sum > 0, f"no grad for {name}"

    def test_dedup_gather_render_parity(self):
        """cfg.agg.dedup_gather must not change the rendered output (same
        loss-bearing forward through the full renderer)."""
        import dataclasses
        cfg = tiny()
        points, grid = make_scene(cfg)
        batch = make_batch(cfg)
        params = renderer.init_params(jax.random.PRNGKey(0), cfg)
        base = renderer.render(params, points, grid, batch, cfg)
        # dedup_uncached opts the non-staged graph in (the default gate
        # applies dedup only to the pyramid-cached executable)
        cfg_dd = cfg.replace(agg=dataclasses.replace(
            cfg.agg, dedup_gather=4096, dedup_uncached=True))
        dd = renderer.render(params, points, grid, batch, cfg_dd)
        np.testing.assert_array_equal(np.asarray(base["coarse_raycolor"]),
                                      np.asarray(dd["coarse_raycolor"]))

    def test_prob_outputs(self):
        cfg = tiny()
        points, grid = make_scene(cfg)
        batch = make_batch(cfg)
        params = renderer.init_params(jax.random.PRNGKey(0), cfg)
        out = renderer.render(params, points, grid, batch, cfg, prob=True)
        R = cfg.sampling.rays_per_batch
        assert out["ray_max_sample_loc_w"].shape == (R, 3)
        assert out["shading_avg_embedding"].shape == (
            R, cfg.points.feature_dim)

    def test_jit_render(self):
        cfg = tiny()
        points, grid = make_scene(cfg)
        batch = make_batch(cfg)
        params = renderer.init_params(jax.random.PRNGKey(0), cfg)
        f = jax.jit(lambda p, pts, g, b: renderer.render(p, pts, g, b, cfg))
        out = f(params, points, grid, batch)
        assert np.isfinite(np.asarray(out["coarse_raycolor"])).all()


class TestNeuralPoints:
    def test_prune(self):
        cfg = tiny()
        points, _ = make_scene(cfg)
        pruned = npts.prune(points, 0.6)
        conf = np.asarray(points.conf[:, 0])
        mask0 = np.asarray(points.mask)
        expect = mask0 & (conf > 0.6)
        np.testing.assert_array_equal(np.asarray(pruned.mask), expect)

    def test_grow_into_free_slots(self):
        cfg = tiny()
        points, _ = make_scene(cfg, n=100)
        M = 16
        rng = np.random.default_rng(0)
        new_xyz = jnp.asarray(rng.uniform(-1, 1, (M, 3)).astype(np.float32))
        new_mask = jnp.asarray(np.arange(M) < 10)
        grown = npts.grow(
            points, new_xyz,
            jnp.zeros((M, cfg.points.feature_dim)), jnp.ones((M, 1)),
            jnp.zeros((M, 3)), jnp.zeros((M, 3)), new_mask)
        assert int(grown.num_live) == 110
        # the first 10 free slots now carry the new coords
        got = np.asarray(grown.xyz[100:110])
        np.testing.assert_allclose(got, np.asarray(new_xyz[:10]), rtol=1e-6)


class TestAttentionFusion:
    def test_attention_block_shapes(self):
        from hybridneuralrendering_tpu.models import attention
        p = attention.init(jax.random.PRNGKey(0), 64, 48, 16)
        q = jnp.ones((10, 64))
        ctx = jnp.ones((10, 4, 48))
        out = attention.apply(p, q, ctx)
        assert out.shape == (10, 48)
        # proj_out zero-init -> output starts at bias = 0
        np.testing.assert_allclose(np.asarray(out), 0.0)

    def test_attention_masks_invalid_views(self):
        from hybridneuralrendering_tpu.models import attention
        p = attention.init(jax.random.PRNGKey(1), 8, 6, 8)
        # make proj nonzero so differences are observable
        p["proj"]["w"] = jnp.ones_like(p["proj"]["w"])
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(5, 8)).astype(np.float32))
        ctx = jnp.asarray(rng.normal(size=(5, 3, 6)).astype(np.float32))
        valid = jnp.asarray([[True, True, False]] * 5)
        out1 = attention.apply(p, q, ctx, valid=valid)
        # perturbing the masked view must not change the output
        ctx2 = ctx.at[:, 2].add(100.0)
        out2 = attention.apply(p, q, ctx2, valid=valid)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                                   rtol=1e-5)

    def test_renderer_with_attention(self):
        import dataclasses
        cfg = tiny()
        cfg = cfg.replace(agg=dataclasses.replace(
            cfg.agg, tradition_attention=True))
        points, grid = make_scene(cfg)
        batch = make_batch(cfg)
        params = renderer.init_params(jax.random.PRNGKey(0), cfg)
        out = renderer.render(params, points, grid, batch, cfg, train=True,
                              key=jax.random.PRNGKey(1))
        assert np.isfinite(np.asarray(out["coarse_raycolor"])).all()


class TestDistanceKernelVariants:
    def _inputs(self, C=6, F=32):
        rng = np.random.default_rng(0)
        dists = jnp.asarray(rng.normal(0, 0.05, (2, 3, 4, C)).astype(np.float32))
        mask = jnp.asarray(rng.random((2, 3, 4)) > 0.3)
        emb = jnp.asarray(rng.normal(size=(2, 3, 4, F)).astype(np.float32))
        return dists, mask, emb

    def test_trilinear_normalized(self):
        d, m, e = self._inputs()
        w, e2 = agg.dist_weight_ex("trilinear", d, m, e, (0.1, 0.1, 0.1), 0.1)
        assert e2.shape == e.shape
        s = np.asarray(jnp.sum(w, -1))
        valid = np.asarray(m).any(-1)
        np.testing.assert_allclose(s[valid], 1.0, rtol=1e-4)

    def test_sh_intrp_consumes_embedding(self):
        d, m, e = self._inputs()
        w, e2 = agg.dist_weight_ex("sh_intrp", d, m, e, (0.1, 0.1, 0.1), 0.1,
                                   sh_degree=3)
        assert e2.shape[-1] == 32 - 9
        assert np.isfinite(np.asarray(w)).all()
        assert (np.asarray(w)[~np.asarray(m)] == 0).all()

    def test_gau_intrp_consumes_embedding(self):
        d, m, e = self._inputs()
        w, e2 = agg.dist_weight_ex("gau_intrp", d, m, e, (0.1, 0.1, 0.1), 0.1)
        assert e2.shape[-1] == 32 - 7
        assert np.isfinite(np.asarray(w)).all()
        assert (np.asarray(w) >= 0).all()

    def test_renderer_with_sh_kernel(self):
        import dataclasses
        cfg = tiny()
        cfg = cfg.replace(
            points=dataclasses.replace(cfg.points, feature_dim=32),
            agg=dataclasses.replace(cfg.agg, agg_distance_kernel="sh_intrp",
                                    point_features_dim=32))
        points, grid = make_scene(cfg)
        batch = make_batch(cfg)
        params = renderer.init_params(jax.random.PRNGKey(0), cfg)
        out = renderer.render(params, points, grid, batch, cfg)
        assert np.isfinite(np.asarray(out["coarse_raycolor"])).all()


class TestEditingRw2c:
    def test_render_with_per_point_rotation(self):
        """Rendering with identity per-point Rw2c must match no-Rw2c exactly."""
        cfg = tiny()
        points, grid = make_scene(cfg)
        batch = make_batch(cfg)
        params = renderer.init_params(jax.random.PRNGKey(0), cfg)
        out_plain = renderer.render(params, points, grid, batch, cfg)
        ident = jnp.tile(jnp.eye(3)[None], (points.capacity, 1, 1))
        pts_rot = points._replace(rw2c=ident)
        out_ident = renderer.render(params, pts_rot, grid, batch, cfg)
        np.testing.assert_allclose(
            np.asarray(out_ident["coarse_raycolor"]),
            np.asarray(out_plain["coarse_raycolor"]), atol=1e-5)

    def test_nontrivial_rotation_changes_output(self):
        cfg = tiny()
        points, grid = make_scene(cfg)
        batch = make_batch(cfg)
        params = renderer.init_params(jax.random.PRNGKey(0), cfg)
        theta = 0.8
        R = jnp.asarray([[np.cos(theta), -np.sin(theta), 0],
                         [np.sin(theta), np.cos(theta), 0],
                         [0, 0, 1.0]], jnp.float32)
        pts_rot = points._replace(
            rw2c=jnp.tile(R[None], (points.capacity, 1, 1)))
        out_a = renderer.render(params, points, grid, batch, cfg)
        out_b = renderer.render(params, pts_rot, grid, batch, cfg)
        hit = np.asarray(out_a["ray_mask"])
        diff = np.abs(np.asarray(out_a["coarse_raycolor"])
                      - np.asarray(out_b["coarse_raycolor"]))[hit]
        assert diff.max() > 1e-4


class TestRematChain:
    def test_remat_matches_plain_values_and_grads(self):
        """remat_chain only changes what the backward stores, never the math
        (needed for the SR=80 NeRF workload to fit HBM)."""
        import dataclasses

        from hybridneuralrendering_tpu import config as C
        from hybridneuralrendering_tpu.data.synthetic import (
            make_synthetic_batch, make_synthetic_scene)
        from hybridneuralrendering_tpu.models import renderer
        from hybridneuralrendering_tpu.train import state as state_mod
        from hybridneuralrendering_tpu.train import step as step_mod

        cfg0 = C.tiny_test()
        cfg1 = cfg0.replace(agg=dataclasses.replace(cfg0.agg,
                                                    remat_chain=True))
        points, grid = make_synthetic_scene(cfg0, num_points=512)
        batch = make_synthetic_batch(cfg0)
        params = renderer.init_params(jax.random.PRNGKey(0), cfg0)

        outs = []
        for cfg in (cfg0, cfg1):
            # fresh buffers each run: train_step donates its state
            pts_i = jax.tree_util.tree_map(jnp.array, points)
            params_i = jax.tree_util.tree_map(jnp.array, params)
            ts = state_mod.create_train_state(params_i, pts_i, cfg)
            ts2, items = step_mod.train_step(
                ts, grid, batch, jax.random.PRNGKey(3), None, cfg)
            outs.append((float(items["loss_total"]),
                         np.asarray(jax.tree_util.tree_leaves(ts2.params)[0])))
        np.testing.assert_allclose(outs[0][0], outs[1][0], rtol=1e-6)
        np.testing.assert_allclose(outs[0][1], outs[1][1], atol=1e-6)


class TestFusedLeakyVjp:
    def test_unit_values_and_grads_match(self):
        """_linear_leaky (output-sign backward) must match default autodiff
        of Linear+LeakyReLU exactly in values and to fp tolerance in grads,
        in f32 and in an end-to-end bf16 chain (the shading_dtype regime)."""
        from hybridneuralrendering_tpu.models import mlp

        key = jax.random.PRNGKey(7)
        layers = mlp.mlp_init(key, (48, 64, 64), "leaky_relu",
                              final_act=True)
        x = jax.random.normal(jax.random.PRNGKey(8), (37, 5, 48))

        def loss(fused, ls, xx):
            y = mlp.mlp_apply(ls, xx, "leaky_relu", final_act=True,
                              fused_vjp=fused)
            return jnp.sum(jnp.sin(y))

        truth = jax.value_and_grad(
            lambda l, z: loss(False, l, z), argnums=(0, 1))(layers, x)[1]
        truth_leaves = jax.tree_util.tree_leaves(truth)
        for dt in (jnp.float32, jnp.bfloat16):
            ls = jax.tree_util.tree_map(lambda a: a.astype(dt), layers)
            xx = x.astype(dt)
            v0, g0 = jax.value_and_grad(
                lambda l, z: loss(False, l, z), argnums=(0, 1))(ls, xx)
            v1, g1 = jax.value_and_grad(
                lambda l, z: loss(True, l, z), argnums=(0, 1))(ls, xx)
            assert float(v0) == float(v1)  # identical forward
            if dt == jnp.float32:
                for a, b in zip(jax.tree_util.tree_leaves(g0),
                                jax.tree_util.tree_leaves(g1)):
                    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                               rtol=1e-5, atol=1e-5)
            else:
                # bf16: the fused bwd accumulates dw/db in f32 while default
                # autodiff accumulates in bf16, so compare both against the
                # f32 ground truth — fused must be at least as accurate
                for t, a, b in zip(truth_leaves,
                                   jax.tree_util.tree_leaves(g0),
                                   jax.tree_util.tree_leaves(g1)):
                    t = np.asarray(t, np.float32)
                    scale = np.abs(t).max() + 1e-6
                    err_default = np.abs(np.asarray(a, np.float32) - t).max()
                    err_fused = np.abs(np.asarray(b, np.float32) - t).max()
                    assert err_fused <= max(err_default * 1.5, 0.02 * scale), \
                        (err_fused, err_default, scale)

    def test_train_step_parity(self):
        """fused_leaky_vjp=True must not change train-step loss or the
        parameter update beyond fp noise."""
        import dataclasses

        from hybridneuralrendering_tpu.data.synthetic import (
            make_synthetic_batch, make_synthetic_scene)
        from hybridneuralrendering_tpu.train import state as state_mod
        from hybridneuralrendering_tpu.train import step as step_mod

        cfg0 = C.tiny_test()
        cfg1 = cfg0.replace(agg=dataclasses.replace(cfg0.agg,
                                                    fused_leaky_vjp=True))
        points, grid = make_synthetic_scene(cfg0, num_points=512)
        batch = make_synthetic_batch(cfg0)
        params = renderer.init_params(jax.random.PRNGKey(0), cfg0)

        outs = []
        for cfg in (cfg0, cfg1):
            pts_i = jax.tree_util.tree_map(jnp.array, points)
            params_i = jax.tree_util.tree_map(jnp.array, params)
            ts = state_mod.create_train_state(params_i, pts_i, cfg)
            ts2, items = step_mod.train_step(
                ts, grid, batch, jax.random.PRNGKey(3), None, cfg)
            outs.append((float(items["loss_total"]),
                         np.asarray(jax.tree_util.tree_leaves(ts2.params)[0])))
        np.testing.assert_allclose(outs[0][0], outs[1][0], rtol=1e-6)
        np.testing.assert_allclose(outs[0][1], outs[1][1], atol=2e-6)
