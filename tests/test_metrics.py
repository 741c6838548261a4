"""Metric-stack tests (utils/metrics.py), including the LPIPS branch.

The torch `lpips` package is NOT installed in this environment (and its
AlexNet/VGG backbones are not in any offline cache), so true LPIPS parity
with the reference protocol (/root/reference/run/evaluate.py:47-83) cannot
be measured here — PARITY.md documents that scope.  These tests cover both
sides of the branch anyway: the package-absent path must degrade cleanly
(None / keys omitted), and the package-present plumbing (RGB->CHW tensor,
[-1,1] scaling, per-net model cache) is exercised against a fake `lpips`
module so a real install works without code changes.
"""

import sys
import types

import numpy as np

from hybridneuralrendering_tpu.utils import metrics as M


def _img(seed, hw=(32, 40)):
    return np.random.default_rng(seed).uniform(0, 1, hw + (3,)).astype(
        np.float32)


class TestBasicMetrics:
    def test_psnr_identity_and_noise(self):
        a = _img(0)
        assert M.psnr(a, a) > 80
        b = np.clip(a + 0.1, 0, 1)
        assert 15 < M.psnr(b, a) < 25

    def test_ssim_orders_degradations(self):
        a = _img(1, (48, 48))
        slight = np.clip(a + 0.02 * _img(2, (48, 48)), 0, 1)
        heavy = np.clip(a + 0.4 * _img(3, (48, 48)), 0, 1)
        assert M.ssim(a, a) > 0.999
        assert M.ssim(slight, a) > M.ssim(heavy, a)


class TestLpipsAbsent:
    def test_lpips_returns_none_without_package(self):
        try:
            import lpips  # noqa: F401
            have = True
        except ImportError:
            have = False
        if have:  # pragma: no cover - only on machines with lpips installed
            import pytest
            pytest.skip("lpips installed here; absent-path not testable")
        assert M.lpips(_img(0), _img(1)) is None

    def test_report_metrics_omits_lpips_keys(self):
        preds, gts = [_img(0), _img(1)], [_img(2), _img(3)]
        out = M.report_metrics(preds, gts, with_lpips=True)
        assert set(out) >= {"psnr", "ssim", "rmse"}
        # the reference writes lpips rows only when measurable; with the
        # package absent the keys must be omitted, not NaN
        assert "lpips" not in out and "vgglpips" not in out
        assert all(np.isfinite(v) for v in out.values())


class TestLpipsPresentPlumbing:
    def test_fake_package_flows_through(self, monkeypatch):
        """With a (fake) lpips module installed, report_metrics carries the
        values through and the per-net model cache is reused."""
        import torch

        calls = {"init": 0}

        class FakeLPIPS:
            def __init__(self, net="alex", verbose=False):
                calls["init"] += 1
                self.net = net

            def __call__(self, a, b):
                # inputs must be [1,3,H,W] torch tensors scaled to [-1,1]
                assert a.shape[0] == 1 and a.shape[1] == 3
                assert float(a.max()) <= 1.0 and float(a.min()) >= -1.0
                return torch.mean((a - b) ** 2)

        fake = types.ModuleType("lpips")
        fake.LPIPS = FakeLPIPS
        monkeypatch.setitem(sys.modules, "lpips", fake)
        monkeypatch.setattr(M, "_LPIPS_CACHE", {})

        preds, gts = [_img(0), _img(1)], [_img(2), _img(3)]
        out = M.report_metrics(preds, gts, with_lpips=True)
        assert "lpips" in out and "vgglpips" in out
        assert np.isfinite(out["lpips"]) and out["lpips"] > 0
        # 2 nets x 2 images, but only 2 constructions (cache hit per net)
        assert calls["init"] == 2
