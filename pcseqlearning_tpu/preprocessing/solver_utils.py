"""GDSolver: gradient-descent registration (velocity-field alternative to
Procrustes ICP).

Rewrite of /root/reference/pcdet/models/registration/solver_utils.py:17-58:
optimizes a per-point rigid-motion field `rt` with a rigidity regularizer via
Adam — not used by the shipped configs, provided for capability parity. Runs
as optax-in-jit with a fixed iteration cap.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import hash_graph, segment_ops


@functools.partial(jax.jit, static_argnames=("num_iters",))
def gd_register(moving_xyz, moving_valid, ref_xyz, ref_valid, radius,
                rigid_weight=1.0, lr=1e-2, num_iters=200):
    """Per-point translation field aligning ``moving`` to ``ref``.

    Loss: sum over NN correspondences of |p + v_p - q|^2 plus rigidity
    |v_p - v_neighbor|^2 over the moving cloud's own radius graph.
    Returns (velocity_field [N, 3], final_loss).
    """
    import optax

    n = moving_xyz.shape[0]
    mov_f = jnp.concatenate([jnp.zeros((n, 1), moving_xyz.dtype), moving_xyz], axis=1)
    nr = ref_xyz.shape[0]
    ref_f = jnp.concatenate([jnp.zeros((nr, 1), ref_xyz.dtype), ref_xyz], axis=1)

    ref_grid = hash_graph.build_hash_grid(ref_f, radius, ref_valid)
    corr_idx, _, corr_ok = hash_graph.radius_neighbors(
        ref_grid, mov_f, radius, 1, query_valid=moving_valid
    )
    corr = jnp.clip(corr_idx[:, 0], 0, nr - 1)
    corr_ok = corr_ok[:, 0]

    self_grid = hash_graph.build_hash_grid(mov_f, radius, moving_valid)
    nbr_idx, _, nbr_ok = hash_graph.radius_neighbors(
        self_grid, mov_f, radius, 8, query_valid=moving_valid
    )
    nbr = jnp.clip(nbr_idx, 0, n - 1)

    target = ref_xyz[corr]
    opt = optax.adam(lr)

    def loss_fn(v):
        fit = jnp.sum(jnp.where(corr_ok[:, None], (moving_xyz + v - target) ** 2, 0.0))
        vn = v[nbr]  # [N, 8, 3]
        rig = jnp.sum(jnp.where(nbr_ok[..., None], (v[:, None, :] - vn) ** 2, 0.0))
        return fit + rigid_weight * rig

    def body(i, state):
        v, o = state
        g = jax.grad(loss_fn)(v)
        upd, o = opt.update(g, o, v)
        return optax.apply_updates(v, upd), o

    v0 = jnp.zeros_like(moving_xyz)
    v, _ = jax.lax.fori_loop(0, num_iters, body, (v0, opt.init(v0)))
    return v, loss_fn(v)
