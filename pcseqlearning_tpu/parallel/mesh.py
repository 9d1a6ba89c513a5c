"""Device mesh construction and batch sharding helpers."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, dp=None, mp=1):
    """Build a (dp, mp) mesh. dp defaults to n_devices // mp. Data-parallel
    gradients psum over 'dp'; 'mp' shards wide channel dims when used."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // mp
    assert dp * mp == n, (dp, mp, n)
    dev_array = np.asarray(devices).reshape(dp, mp)
    return Mesh(dev_array, axis_names=("dp", "mp"))


def replicate(mesh, tree):
    """Fully replicate a pytree over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(mesh, batch, batch_axis_keys=("point_bxyz", "point_feat", "point_valid", "gt_boxes")):
    """Shard the leading (batch) axis of array leaves across 'dp'; everything
    else replicated. Point tables are [B, N, ...] in the sharded layout."""
    dp_sharding = NamedSharding(mesh, P("dp"))
    rep = NamedSharding(mesh, P())

    def place(k, v):
        if hasattr(v, "ndim") and v.ndim >= 1 and k in batch_axis_keys:
            return jax.device_put(v, dp_sharding)
        if hasattr(v, "ndim"):
            return jax.device_put(v, rep)
        return v

    return {k: place(k, v) for k, v in batch.items()}
