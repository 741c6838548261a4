"""Torch-checkpoint importers: pretrained MVSNet / RAFT -> JAX param trees.

The reference's feed-forward bootstrap loads the official-MVSNet checkpoint
`checkpoints/MVSNet/model_000014.ckpt`
(/root/reference/models/mvs/mvs_points_model.py:66-74 — a dict with key
'model' holding a DataParallel `module.`-prefixed state_dict) and the
frame-weight tool loads a pretrained RAFT
(/root/reference/raft/demo_content_aware_weights.py:99-107, plain state_dict,
also `module.`-prefixed).  These converters map those state_dicts onto the
param trees of mvs/mvsnet.py and flow/raft.py.

Layout conventions:
  torch Conv2d  w [O, I, kh, kw]          -> HWIO  [kh, kw, I, O]
  torch Conv3d  w [O, I, kd, kh, kw]      -> DHWIO [kd, kh, kw, I, O]
  torch ConvTranspose3d w [I, O, kd, ...] -> spatially flipped DHWIO with the
      transpose-conv implemented as lhs_dilation conv (mvsnet._deconv3d_*)
  torch BatchNorm (weight, bias, running_mean, running_var)
      -> {scale, bias, mean, var}
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth/.ckpt into a flat {name: np.ndarray} dict.

    Unwraps the MVSNet trainer's {'model': ...} container and strips
    DataParallel's 'module.' prefix (mvs_points_model.py:70-73)."""
    import torch
    sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[7:]
        if hasattr(v, "detach"):
            out[k] = v.detach().cpu().numpy()
    return out


def _c2d(sd, name, bias=True):
    w = np.transpose(sd[f"{name}.weight"], (2, 3, 1, 0))
    p = {"w": np.ascontiguousarray(w)}
    if bias:
        p["b"] = sd[f"{name}.bias"]
    return p


def _c3d(sd, name):
    w = np.transpose(sd[f"{name}.weight"], (2, 3, 4, 1, 0))
    return {"w": np.ascontiguousarray(w)}


def _c3dT(sd, name):
    # ConvTranspose3d [I, O, kd, kh, kw]: flip spatial dims, then DHWIO with
    # I = the transpose-conv's input channels (the lhs_dilation formulation)
    w = sd[f"{name}.weight"][:, :, ::-1, ::-1, ::-1]
    w = np.transpose(w, (2, 3, 4, 0, 1))
    return {"w": np.ascontiguousarray(w)}


def _bn(sd, name):
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"],
            "mean": sd[f"{name}.running_mean"],
            "var": sd[f"{name}.running_var"]}


# ---------------------------------------------------------------------------
# Official MVSNet (depth_estimators/mvsnet.py) -> mvs/mvsnet.py params
# ---------------------------------------------------------------------------

def import_mvsnet(sd: Dict[str, np.ndarray]) -> Dict:
    def cbn2(name):
        return {"conv": _c2d(sd, f"{name}.conv", bias=False),
                "bn": _bn(sd, f"{name}.bn")}

    def cbn3(name):
        return {"conv": _c3d(sd, f"{name}.conv"),
                "bn": _bn(sd, f"{name}.bn")}

    def dcbn3(name):
        # nn.Sequential(ConvTranspose3d, BatchNorm3d, ReLU) -> indices 0, 1
        return {"conv": _c3dT(sd, f"{name}.0"), "bn": _bn(sd, f"{name}.1")}

    feature = {
        **{f"conv{i}": cbn2(f"feature.conv{i}") for i in range(7)},
        "feature": _c2d(sd, "feature.feature"),
    }
    cr = "cost_regularization"
    cost_reg = {
        **{f"conv{i}": cbn3(f"{cr}.conv{i}") for i in (0, 1, 2, 3, 4, 5, 6)},
        "conv7": dcbn3(f"{cr}.conv7"),
        "conv9": dcbn3(f"{cr}.conv9"),
        "conv11": dcbn3(f"{cr}.conv11"),
        "prob": {"w": _c3d(sd, f"{cr}.prob")["w"],
                 "b": sd[f"{cr}.prob.bias"]},
    }
    import jax.numpy as jnp
    import jax
    return jax.tree_util.tree_map(jnp.asarray, {"feature": feature,
                                                "cost_reg": cost_reg})


# ---------------------------------------------------------------------------
# RAFT (raft/core/raft.py) -> flow/raft.py RaftParams
# ---------------------------------------------------------------------------

def _raft_block(sd, name, batch: bool):
    p = {"c1": _c2d(sd, f"{name}.conv1"), "c2": _c2d(sd, f"{name}.conv2")}
    if f"{name}.downsample.0.weight" in sd:
        p["down"] = _c2d(sd, f"{name}.downsample.0")
    if batch:
        p["bn1"] = _bn(sd, f"{name}.norm1")
        p["bn2"] = _bn(sd, f"{name}.norm2")
        if "down" in p:
            p["bn3"] = _bn(sd, f"{name}.norm3")
    return p


def _raft_encoder(sd, prefix, batch: bool):
    p = {
        "conv1": _c2d(sd, f"{prefix}.conv1"),
        "l1a": _raft_block(sd, f"{prefix}.layer1.0", batch),
        "l1b": _raft_block(sd, f"{prefix}.layer1.1", batch),
        "l2a": _raft_block(sd, f"{prefix}.layer2.0", batch),
        "l2b": _raft_block(sd, f"{prefix}.layer2.1", batch),
        "l3a": _raft_block(sd, f"{prefix}.layer3.0", batch),
        "l3b": _raft_block(sd, f"{prefix}.layer3.1", batch),
        "conv2": _c2d(sd, f"{prefix}.conv2"),
    }
    if batch:
        p["bn0"] = _bn(sd, f"{prefix}.norm1")
    return p


def import_raft(sd: Dict[str, np.ndarray]):
    from hybridneuralrendering_tpu.flow.raft import RaftParams
    ub = "update_block"
    update = {
        "mc1": _c2d(sd, f"{ub}.encoder.convc1"),
        "mc2": _c2d(sd, f"{ub}.encoder.convc2"),
        "mf1": _c2d(sd, f"{ub}.encoder.convf1"),
        "mf2": _c2d(sd, f"{ub}.encoder.convf2"),
        "mout": _c2d(sd, f"{ub}.encoder.conv"),
        "gz1": _c2d(sd, f"{ub}.gru.convz1"),
        "gr1": _c2d(sd, f"{ub}.gru.convr1"),
        "gq1": _c2d(sd, f"{ub}.gru.convq1"),
        "gz2": _c2d(sd, f"{ub}.gru.convz2"),
        "gr2": _c2d(sd, f"{ub}.gru.convr2"),
        "gq2": _c2d(sd, f"{ub}.gru.convq2"),
        "fh1": _c2d(sd, f"{ub}.flow_head.conv1"),
        "fh2": _c2d(sd, f"{ub}.flow_head.conv2"),
        "mk1": _c2d(sd, f"{ub}.mask.0"),
        "mk2": _c2d(sd, f"{ub}.mask.2"),
    }
    import jax.numpy as jnp
    import jax
    tree = {"fnet": _raft_encoder(sd, "fnet", batch=False),
            "cnet": _raft_encoder(sd, "cnet", batch=True),
            "update": update}
    tree = jax.tree_util.tree_map(jnp.asarray, tree)
    return RaftParams(**tree)
