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


def gd_register_components(moving_xyz, moving_comp, moving_valid, ref_xyz, ref_valid,
                           num_components, radius, rigid_weight=1.0, lr=1e-2,
                           num_iters=200, num_rounds=4):
    """Config-wired GDSolver path (reference solver_utils.GDSolver): solve
    the per-point velocity field (with ``num_rounds`` outer
    correspondence refreshes — fixed-NN gradient descent only contracts
    partially, like a single ICP iteration), then extract a rigid
    [C, 4, 4] transform per component by Procrustes on (p, p + v_p)
    pairs — the drop-in signature of register_to_next_frame's
    (T, l1, ratio) contract."""
    from ..ops import geometry

    C = num_components
    cur = moving_xyz
    for _ in range(num_rounds):
        dv, _ = gd_register(cur, moving_valid, ref_xyz, ref_valid, radius,
                            rigid_weight=rigid_weight, lr=lr, num_iters=num_iters)
        cur = cur + dv
    v = cur - moving_xyz
    comp_safe = jnp.where(moving_valid & (moving_comp >= 0), moving_comp, C)
    tgt = moving_xyz + v
    mc = segment_ops.segment_mean(moving_xyz, comp_safe, C + 1)[:C]
    tc = segment_ops.segment_mean(tgt, comp_safe, C + 1)[:C]
    cc = jnp.clip(comp_safe, 0, C - 1)
    P = jnp.where(moving_valid[:, None], moving_xyz - mc[cc], 0.0)
    Q = jnp.where(moving_valid[:, None], tgt - tc[cc], 0.0)
    cov = segment_ops.segment_mean(P[:, :, None] * Q[:, None, :], comp_safe, C + 1)[:C]
    R = geometry.procrustes_rotation(jnp.swapaxes(cov, -1, -2))
    t = tc - jnp.einsum("cij,cj->ci", R, mc, precision=jax.lax.Precision.HIGHEST)
    T = geometry.make_rigid(R, t)
    # residual after the rigid fit, per component
    moved = jnp.einsum("nij,nj->ni", R[cc], moving_xyz, precision=jax.lax.Precision.HIGHEST) + t[cc]
    res = jnp.linalg.norm(moved - tgt, axis=-1)
    l1 = segment_ops.segment_mean(jnp.where(moving_valid, res, 0.0), comp_safe, C + 1)[:C]
    deg = segment_ops.segment_count(comp_safe, C + 1)[:C]
    ratio = jnp.where(deg > 0.5, 1.0, 0.0)
    return T, l1, ratio
