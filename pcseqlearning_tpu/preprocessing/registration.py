"""Per-component rigid ICP between adjacent frames — the hottest loop of the
extraction pipeline.

TPU-native rewrite of register_to_next_frame
(/root/reference/pcdet/models/registration/preprocessors/registration_utils.py:83-206):
all components are solved simultaneously as a [C, 3, 3] Procrustes batch per
ICP iteration inside one `lax.while_loop`; bidirectional nearest-neighbor
correspondences come from the hash-grid kernel (the reference's
radius_graph_gpu with MAX_NUM_NEIGHBORS=1, SORT_BY_DIST=True).

Numerics: the reference solves in f64 (registration_utils.py:117,150-153).
On TPU we mean-center before covariance accumulation and refine the f32
Procrustes solve with Newton steps on SO(3) (ops/geometry.py) — equivalent
accuracy for this workload without f64 emulation.

Frame handling: both frames are single time slices, so the 4D hash coords use
frame=0 on both sides; the reference's sqrt(r^2+off^2) 4D-radius trick
(registration_utils.py:111-112) then reduces to a purely spatial radius r.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import geometry, hash_graph, segment_ops


def _zero_frame(fxyz):
    return jnp.concatenate([jnp.zeros_like(fxyz[:, :1]), fxyz[:, 1:4]], axis=1)


# Below this many distance-matrix entries, nearest-neighbor correspondences
# ride the MXU (one [M, N] matmul + argmin) instead of the hash grid: TPU
# random gathers run ~100M elem/s while the MXU does the whole matrix in
# microseconds. ICP operates on grid-subsampled tables (<= tens of k), so
# this is the common case; the hash path covers large tables.
_BRUTE_NN_MAX_ENTRIES = 1 << 28


def _nn1_brute(ref_xyz, ref_valid, query_xyz, query_valid, radius):
    """Nearest ref within radius per query via MXU distance matrix.

    The |q|^2+|r|^2-2qr expansion PRESELECTS a top-4 candidate set (its
    f32 cancellation error is O(eps * coord^2) ~ 1e-4 m^2 at scene scale,
    enough to flip genuine near-ties); the winner is then re-ranked by
    EXACT subtraction-based f32 distances, so the returned NN matches an
    f64 oracle except for ties below ~1e-6.
    """
    # center both clouds (shrinks magnitudes so the expansion stays
    # accurate) and keep full f32 on the K=3 matmul — bf16 inputs would
    # put O(coordinate^2 * 0.4%) absolute error into d2, swamping radius^2
    mid = jnp.sum(jnp.where(ref_valid[:, None], ref_xyz, 0.0), axis=0) / jnp.maximum(
        jnp.sum(ref_valid), 1
    )
    q = query_xyz - mid
    r = ref_xyz - mid
    qn = jnp.sum(q * q, axis=-1)
    rn = jnp.sum(r * r, axis=-1)
    cross = jnp.matmul(q, r.T, precision=jax.lax.Precision.HIGHEST)
    d2 = qn[:, None] + rn[None, :] - 2.0 * cross
    big = jnp.asarray(jnp.inf, d2.dtype)
    d2 = jnp.where(ref_valid[None, :], d2, big)
    k = min(4, ref_xyz.shape[0])
    _, cand = jax.lax.top_k(-d2, k)  # [M, k] candidate ref indices
    diff = ref_xyz[cand] - query_xyz[:, None, :]  # [M, k, 3]
    d2_cand = jnp.sum(diff * diff, axis=-1)
    d2_cand = jnp.where(ref_valid[cand], d2_cand, big)
    best = jnp.argmin(d2_cand, axis=1)
    m_iota = jnp.arange(query_xyz.shape[0])
    idx = cand[m_iota, best].astype(jnp.int32)
    d2_exact = d2_cand[m_iota, best]
    ok = query_valid & jnp.any(ref_valid) & (d2_exact <= radius * radius)
    return idx, d2_exact, ok


def _nn1(ref_xyz, ref_valid, query_xyz, query_valid, radius, cell_cap):
    """Adaptive nearest-1-in-radius: MXU brute force for small tables,
    hash grid otherwise."""
    m, n = query_xyz.shape[0], ref_xyz.shape[0]
    if m * n <= _BRUTE_NN_MAX_ENTRIES:
        return _nn1_brute(ref_xyz, ref_valid, query_xyz, query_valid, radius)
    ref_f = jnp.concatenate([jnp.zeros((n, 1), ref_xyz.dtype), ref_xyz], axis=1)
    q_f = jnp.concatenate([jnp.zeros((m, 1), query_xyz.dtype), query_xyz], axis=1)
    grid = hash_graph.build_hash_grid(ref_f, radius, ref_valid)
    idx, d2, mask = hash_graph.radius_neighbors(
        grid, q_f, radius, 1, query_valid=query_valid, cell_cap=cell_cap
    )
    return idx[:, 0], d2[:, 0], mask[:, 0]


@functools.partial(
    jax.jit,
    static_argnames=("num_components", "max_iter", "cell_cap"),
)
def register_to_next_frame(
    moving_xyz,
    moving_comp,
    moving_valid,
    ref_xyz,
    ref_valid,
    num_components,
    radius,
    angle_regularizer=10.0,
    max_iter=80,
    stopping_delta=5e-2,
    trunc_dist=0.3,
    cell_cap=hash_graph.DEFAULT_CELL_CAP,
):
    """Register each component of ``moving`` onto ``ref``.

    Args:
        moving_xyz: [Nm, 3] non-stationary source points (padded).
        moving_comp: [Nm] int32 component id per point (-1 = padding).
        moving_valid: [Nm] bool.
        ref_xyz: [Nr, 3] target points (padded); ref_valid: [Nr] bool.
        num_components: static C.
        radius: traced spatial correspondence radius.
        angle_regularizer: pulls total rotation toward identity (reference
            multiplies the accumulated rotation by this weight into the
            covariance before the SVD solve, registration_utils.py:165-167).
        max_iter / stopping_delta: loss-countdown stopping (lines 180-186).
        trunc_dist: truncated-robust-mean clamp for the per-component error.
    Returns:
        T [C, 4, 4]          — per-component rigid transform (moving -> ref)
        l1_error [C]         — truncated robust mean correspondence distance
        comp_edge_ratio [C]  — fraction of component points with a match
        moved_xyz [Nm, 3]    — transformed source points
    """
    C = num_components
    nm = moving_xyz.shape[0]
    nr = ref_xyz.shape[0]
    comp_safe = jnp.where(moving_valid & (moving_comp >= 0), moving_comp, C)

    T0 = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (C, 4, 4))

    def correspondences(xyz):
        """Bidirectional NN edges; returns per-edge (m_idx, r_idx, valid)."""
        # forward: each moving point -> nearest ref
        f_idx, _, f_ok = _nn1(ref_xyz, ref_valid, xyz, moving_valid, radius, cell_cap)
        # backward: each ref point -> nearest moving (recomputed every
        # iteration since the moving points move)
        b_idx, _, b_ok = _nn1(xyz, moving_valid, ref_xyz, ref_valid, radius, cell_cap)
        e_m = jnp.concatenate([jnp.arange(nm, dtype=jnp.int32), b_idx])
        e_r = jnp.concatenate([f_idx, jnp.arange(nr, dtype=jnp.int32)])
        e_ok = jnp.concatenate([f_ok, b_ok])
        return e_m, e_r, e_ok

    def solve(xyz, T):
        e_m, e_r, e_ok = correspondences(xyz)
        e_c = jnp.where(e_ok, comp_safe[jnp.clip(e_m, 0, nm - 1)], C)
        pm = xyz[jnp.clip(e_m, 0, nm - 1)]
        pr = ref_xyz[jnp.clip(e_r, 0, nr - 1)]

        mc = segment_ops.segment_mean(pm, e_c, C + 1)[:C]
        rc = segment_ops.segment_mean(pr, e_c, C + 1)[:C]
        e_c_c = jnp.clip(e_c, 0, C - 1)
        P = jnp.where(e_ok[:, None], pm - mc[e_c_c], 0.0)
        Q = jnp.where(e_ok[:, None], pr - rc[e_c_c], 0.0)
        dist = jnp.linalg.norm(P - Q, axis=-1)
        dist_m = jnp.where(e_ok, dist, 0.0)

        l1_err = segment_ops.truncated_segment_mean(
            jnp.where(e_ok, dist, 0.0), e_c, C + 1, trunc_dist
        )[:C]
        loss = jnp.sum(jnp.where(e_ok, dist * dist, 0.0))

        H = P[:, :, None] * Q[:, None, :]
        cov = segment_ops.segment_mean(H, e_c, C + 1)[:C]
        reg = T[:, :3, :3] * angle_regularizer
        # R maximizes tr(R (cov + reg)) => procrustes on the transpose
        R = geometry.procrustes_rotation(jnp.swapaxes(cov + reg, -1, -2))
        t = rc - jnp.einsum("cij,cj->ci", R, mc, precision=jax.lax.Precision.HIGHEST)
        return R, t, l1_err, loss

    def cond(state):
        xyz, T, l1, last_loss, countdown, it = state
        return (countdown > 0) & (it < max_iter)

    def body(state):
        xyz, T, _, last_loss, countdown, it = state
        R, t, l1_err, loss = solve(xyz, T)
        c = jnp.clip(comp_safe, 0, C - 1)
        xyz = jnp.einsum("nij,nj->ni", R[c], xyz, precision=jax.lax.Precision.HIGHEST) + t[c]
        Ti = geometry.make_rigid(R, t)
        T = jnp.matmul(Ti, T, precision=jax.lax.Precision.HIGHEST)
        countdown = jnp.where(last_loss - loss < stopping_delta, countdown - 1, 3)
        return xyz, T, l1_err, loss, countdown, it + 1

    init = (
        moving_xyz,
        T0,
        jnp.zeros((C,), moving_xyz.dtype),
        jnp.asarray(1e10, moving_xyz.dtype),
        3,
        0,
    )
    xyz, T, l1_err, _, _, iters = jax.lax.while_loop(cond, body, init)

    # edge-coverage ratio: forward-only correspondences of the final pose
    # (reference registration_utils.py:189-199)
    _, _, f_ok = _nn1(ref_xyz, ref_valid, xyz, moving_valid, radius, cell_cap)
    deg = segment_ops.segment_count(comp_safe, C + 1)[:C]
    hits = segment_ops.segment_count(jnp.where(f_ok, comp_safe, C), C + 1)[:C]
    comp_edge_ratio = hits / (deg + 1e-6)

    return T, l1_err, comp_edge_ratio, xyz
