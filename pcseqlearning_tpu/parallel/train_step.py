"""pjit/shard_map data-parallel train step.

The DDP replacement (reference tools/train.py:173-174): each device runs the
full detector on its local batch shard inside `shard_map`; gradients and
batch-norm statistics are `pmean`-ed over the 'dp' axis — the all-reduce is
fused into the compiled step and rides ICI.

Batch layout for SPMD: dense per-sample tables [B, N_cap, ...] with validity
masks, sharded on B. Inside the per-device function the local shard is
flattened back to the framework's flat point-table form.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def dense_batch_from_collated(batch, n_cap, max_gt=128):
    """Convert the collate output (flat point table + batch idx) into the
    SPMD layout: points [B, N_cap, 4], feats [B, N_cap, C], valid [B, N_cap],
    gt_boxes [B, max_gt, 8]."""
    bxyz = np.asarray(batch["point_bxyz"])
    feat = np.asarray(batch.get("point_feat", np.zeros((len(bxyz), 1), np.float32)))
    B = int(batch["batch_size"])
    C = feat.shape[1]
    pts = np.zeros((B, n_cap, 4), np.float32)
    fts = np.zeros((B, n_cap, C), np.float32)
    val = np.zeros((B, n_cap), bool)
    for b in range(B):
        m = bxyz[:, 0].round().astype(int) == b
        n = min(int(m.sum()), n_cap)
        rows = np.nonzero(m)[0][:n]
        pts[b, :n] = bxyz[rows]
        pts[b, :n, 0] = 0  # batch idx assigned per-device later
        fts[b, :n] = feat[rows]
        val[b, :n] = True
    gt = np.asarray(batch.get("gt_boxes", np.zeros((B, 1, 8), np.float32)))
    g = np.zeros((B, max_gt, gt.shape[-1]), np.float32)
    g[:, : min(gt.shape[1], max_gt)] = gt[:, :max_gt]
    return dict(points=pts, feats=fts, valid=val, gt_boxes=g)


def _flatten_local(points, feats, valid, gt_boxes):
    """[Bl, N, .] -> flat table with local batch indices."""
    bl, n, _ = points.shape
    bidx = jnp.repeat(jnp.arange(bl, dtype=points.dtype), n).reshape(bl, n)
    pts = points.at[:, :, 0].set(bidx)
    return {
        "point_bxyz": pts.reshape(bl * n, 4),
        "point_feat": feats.reshape(bl * n, -1),
        "point_valid": valid.reshape(bl * n),
        "gt_boxes": gt_boxes,
        "batch_size": bl,
    }


def make_train_step(model, tx, mesh, loss_key="rpn_loss", freeze_regexes=(), freeze_until=0):
    """Build the compiled SPMD train step.

    model: a flax detector whose train=True apply populates
    batch_dict['losses'][loss_key].
    freeze_regexes/freeze_until: zero the gradients of parameters whose path
    matches any regex until global step ``freeze_until`` (reference
    ZEROGRAD_MODULES, tools/train_utils/train_utils.py:65-72)."""
    import re

    patterns = [re.compile(r) for r in freeze_regexes]

    def local_loss(params, batch_stats, local):
        from ..models.layers import bn_cross_replica

        bd = _flatten_local(local["points"], local["feats"], local["valid"], local["gt_boxes"])
        # sync-BN over the dp axis: batch-norm moments are global-batch
        # moments, so the dp=K step is numerically identical to dp=1 (the
        # reference's optional SyncBatchNorm, tools/train.py:146-147, made
        # the default because it also makes DDP-equivalence exactly testable)
        with bn_cross_replica("dp"):
            out, mut = model.apply(
                {"params": params, "batch_stats": batch_stats}, bd, train=True,
                mutable=["batch_stats"],
            )
        # pmean BEFORE differentiating: under shard_map AD the gradient of a
        # replicated input is psum'd across shards, so differentiating the
        # per-shard loss and pmean-ing grads afterwards yields D-times the
        # mean gradient. Differentiating the pmean'd loss gives exactly the
        # global-batch gradient (matches dp=1 and torch-DDP averaging).
        loss = jax.lax.pmean(out["losses"][loss_key], "dp")
        return loss, (mut["batch_stats"], out["losses"])

    batch_specs = {"points": P("dp"), "feats": P("dp"), "valid": P("dp"), "gt_boxes": P("dp")}

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), batch_specs),
        out_specs=(P(), P()),
    )
    def sharded_grads(state, batch):
        (loss, (new_stats, losses)), grads = jax.value_and_grad(
            local_loss, has_aux=True
        )(state.params, state.batch_stats, batch)
        # grads are already the global-mean gradient (the loss is pmean'd
        # before differentiation inside local_loss); only stats/telemetry
        # still need their cross-shard mean here
        new_stats = jax.lax.pmean(new_stats, "dp")
        losses = jax.lax.pmean(losses, "dp")
        return TrainState(state.params, new_stats, state.opt_state, state.step), (grads, losses)

    @jax.jit
    def train_step(state: TrainState, batch):
        state, (grads, losses) = sharded_grads(state, batch)
        import optax

        if patterns:
            def zero_frozen(path, g):
                name = "/".join(str(getattr(k, "key", k)) for k in path)
                if any(p.search(name) for p in patterns):
                    return jnp.where(state.step < freeze_until, jnp.zeros_like(g), g)
                return g

            grads = jax.tree_util.tree_map_with_path(zero_frozen, grads)
        # grad-norm telemetry (reference logs per-parameter L2/Linf,
        # train_utils.py:58-63): global norm suffices for loss scalars here
        losses = dict(losses)
        losses["grad_norm"] = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, state.batch_stats, opt_state, state.step + 1), losses

    return train_step


def init_train_state(model, tx, sample_batch, rng=None):
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    bd = _flatten_local(
        jnp.asarray(sample_batch["points"]),
        jnp.asarray(sample_batch["feats"]),
        jnp.asarray(sample_batch["valid"]),
        jnp.asarray(sample_batch["gt_boxes"]),
    )
    bs = bd.pop("batch_size")
    variables = jax.jit(lambda key, a: model.init(key, {**a, "batch_size": bs}, train=True))(rng, bd)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(params, batch_stats, tx.init(params), jnp.zeros((), jnp.int32))
