"""On-device training of the range-image segmentator on synthetic scans.

The reference ships pretrained RangeNet++ pickles (infer_node.py:51-58);
no released weights can be downloaded in this environment, so this module
closes the trained-weights gap from first principles: it labels simulated
range images with the ground-truth segmenter (the reference's `use_sim`
shortcut, process_cloud_node_outdoor.py:204-214), trains the flax
`RangeSegmentator` for a few hundred steps, and returns variables that the
raw-cloud pipeline consumes exactly like converted torch weights — proving
the projection -> net -> unprojection -> clustering -> backend chain
composes (infer_node.py:119-318 -> process_cloud_node_outdoor.py:222-468).
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..geometry import se3np
from . import range_projection
from .segmentation import RangeSegmentator


def make_synthetic_dataset(scans, poses, labeler: Callable,
                           height: int, width: int,
                           fov_up_deg: float = 15.0,
                           fov_down_deg: float = -15.0):
    """(inputs [N, H, W, 5], labels [N, H, W], valid [N, H, W]).

    scans: list of [Ni, 3] body-frame clouds; poses: matching sensor poses;
    labeler: a ground_truth_segmenter-style fn([1,H,W,5]) -> [1,H,W]."""
    xs, ys, vs = [], [], []
    for pts, pose in zip(scans, poses):
        pts = np.asarray(pts, np.float32)
        ri = range_projection.project(
            jnp.asarray(pts), jnp.zeros((len(pts),), jnp.float32),
            jnp.ones((len(pts),), bool), height=height, width=width,
            fov_up_deg=fov_up_deg, fov_down_deg=fov_down_deg)
        x = jnp.moveaxis(range_projection.make_model_input(ri)[None], 1, -1)
        y = labeler(x)
        xs.append(np.asarray(x[0]))
        ys.append(np.asarray(y[0]))
        vs.append(np.asarray(x[0, ..., 0] > 0))
    return np.stack(xs), np.stack(ys), np.stack(vs)


def train_segmentator(model: RangeSegmentator, inputs, labels, valid,
                      steps: int = 200, lr: float = 1e-3, batch: int = 2,
                      seed: int = 0) -> Tuple[dict, dict]:
    """Masked-cross-entropy training; returns (variables, metrics)."""
    rng = jax.random.PRNGKey(seed)
    variables = model.init(rng, jnp.asarray(inputs[:1]), train=False)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    inputs = jnp.asarray(inputs)
    labels = jnp.asarray(labels)
    valid = jnp.asarray(valid)

    def loss_fn(p, bs, x, y, v):
        out, new_model_state = model.apply(
            {"params": p, "batch_stats": bs}, x, train=True,
            mutable=["batch_stats"])
        ce = optax.softmax_cross_entropy_with_integer_labels(out, y)
        loss = jnp.sum(ce * v) / jnp.maximum(jnp.sum(v), 1.0)
        return loss, new_model_state["batch_stats"]

    @jax.jit
    def step(p, bs, o, x, y, v):
        (loss, bs), g = jax.value_and_grad(loss_fn, has_aux=True)(p, bs, x, y, v)
        updates, o = tx.update(g, o, p)
        return optax.apply_updates(p, updates), bs, o, loss

    n = len(inputs)
    order = np.random.default_rng(seed)
    loss = jnp.inf
    for it in range(steps):
        idx = order.integers(0, n, batch)
        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state,
            inputs[idx], labels[idx], valid[idx].astype(jnp.float32))
    variables = {"params": params, "batch_stats": batch_stats}
    return variables, {"final_loss": float(loss), "steps": steps}


def mean_iou(pred, true, valid, num_classes: int) -> float:
    """Mean intersection-over-union over classes present in `true`."""
    pred = np.asarray(pred)[np.asarray(valid)]
    true = np.asarray(true)[np.asarray(valid)]
    ious = []
    for c in range(num_classes):
        t, p = true == c, pred == c
        union = np.logical_or(t, p).sum()
        if t.sum() == 0:
            continue
        ious.append(np.logical_and(t, p).sum() / max(union, 1))
    return float(np.mean(ious)) if ious else 0.0
