"""Train state: parameters, neural points, optimizers, schedules.

Replaces the reference's three torch Adam groups + LambdaLR schedulers
(/root/reference/models/mvs_points_volumetric_model.py:49-131,
models/helpers/networks.py:41-68) with optax: one Adam for network params at
`lr`, one for neural-point attributes at `plr`, both under the
`iter_exponential_decay` schedule.  The whole state is a pytree — it shards,
donates, and checkpoints as a unit.

Topology changes (grow/prune) reset optimizer moments exactly as the
reference's deliberate process-restart did (SURVEY §5 checkpoint/resume).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax.numpy as jnp
import optax

from hybridneuralrendering_tpu.config import Config, OptimConfig
from hybridneuralrendering_tpu.models import neural_points as npts


class TrainState(NamedTuple):
    step: jnp.ndarray             # [] i32
    params: Dict                  # network parameters
    points: npts.NeuralPoints     # scene (optimizable attributes inside)
    opt_state_net: Any
    opt_state_pts: Any


def lr_schedule(base_lr: float, cfg: OptimConfig):
    if cfg.lr_policy == "iter_exponential_decay":
        # lr * decay_exp ** (step / decay_iters)   (networks.py:58-62)
        return lambda step: base_lr * jnp.power(
            cfg.lr_decay_exp, step / cfg.lr_decay_iters)
    if cfg.lr_policy == "constant":
        return lambda step: base_lr
    raise KeyError(f"unknown lr policy {cfg.lr_policy}")


def make_optimizers(cfg: OptimConfig):
    opt_net = optax.adam(lr_schedule(cfg.lr, cfg), b1=cfg.beta1, b2=cfg.beta2)
    opt_pts = optax.adam(lr_schedule(cfg.plr, cfg), b1=cfg.beta1, b2=cfg.beta2)
    return opt_net, opt_pts


def point_param_tree(points: npts.NeuralPoints, cfg: Config) -> Dict:
    """The optimizable point state: the stacked attribute table (one leaf).

    Frozen attributes receive exactly-zero gradients (stop_gradient in
    neural_points.gather), so their lanes never move under Adam; when no
    attribute is trainable the tree is empty.  (Two measured-dead-end
    layout/kernel alternatives — a flattened 1-D leaf and a fused Pallas
    Adam — live in tools/; see the CLAUDE.md round-3 perf log.)"""
    if not any(points.trainable):
        return {}
    return {"table": points.table}


def merge_point_params(points: npts.NeuralPoints, tree: Dict) -> npts.NeuralPoints:
    return points._replace(**{
        k: v.reshape(getattr(points, k).shape) for k, v in tree.items()})


def create_train_state(params: Dict, points: npts.NeuralPoints,
                       cfg: Config) -> TrainState:
    opt_net, opt_pts = make_optimizers(cfg.optim)
    return TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=params,
        points=points,
        opt_state_net=opt_net.init(params),
        opt_state_pts=opt_pts.init(point_param_tree(points, cfg)),
    )


def reset_optimizers(state: TrainState, cfg: Config) -> TrainState:
    """Fresh Adam moments after grow/prune (the reference restarts the process,
    intentionally resetting optimizer state — run/train_ft.py:909-952)."""
    opt_net, opt_pts = make_optimizers(cfg.optim)
    return state._replace(
        opt_state_net=opt_net.init(state.params),
        opt_state_pts=opt_pts.init(point_param_tree(state.points, cfg)),
    )
