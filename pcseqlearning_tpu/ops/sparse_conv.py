"""Sparse 3D convolution as gather-GEMM-scatter over voxel coordinate tables.

Replaces the vendored/external spconv 1.x engine
(/root/reference/pcdet/ops/spconv/: get_indice_pairs / indice_conv /
indice_maxpool, include/spconv/spconv_ops.h) that powers every voxel backbone
(VoxelBackBone8x, UNetV2 — /root/reference/pcdet/models/backbones_3d/
spconv_backbone.py, spconv_unet.py).

TPU design:
  * a sparse tensor is a fixed-capacity padded table (features [V, C],
    coords [V, 4] int32 (b, z, y, x), valid [V]);
  * the "rulebook" is a [K, V] neighbor-index matrix resolved through the
    sorted-hash exact-match lookup (ops/hash_graph.build_coord_table /
    coord_lookup) — no atomics, no dynamic allocation;
  * the conv itself is a lax.scan over kernel offsets of
    (masked gather -> [V, Cin] x [Cin, Cout] MXU matmul -> accumulate),
    which is exactly the gather-GEMM-scatter schedule of spconv but with the
    GEMM batched on the MXU and the scatter replaced by dense accumulation
    (submanifold) or segment-sum (strided).

Weight layout: [K, Cin, Cout] with K enumerating kernel offsets in
itertools.product order over (dz, dy, dx).
"""

from __future__ import annotations

import functools
import itertools
import os
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from . import grid_utils, hash_graph, segment_ops


class SparseTensor(NamedTuple):
    features: jnp.ndarray  # [V, C] (invalid rows must be zero)
    coords: jnp.ndarray  # [V, 4] int32 (b, z, y, x)
    valid: jnp.ndarray  # [V] bool
    spatial_shape: tuple  # static (D, H, W)
    batch_size: int  # static


def kernel_offsets(kernel_size):
    """[K, 3] int32 (dz, dy, dx) offsets in scan order."""
    if isinstance(kernel_size, int):
        kernel_size = (kernel_size,) * 3
    offs = list(itertools.product(*[range(k) for k in kernel_size]))
    return jnp.asarray(offs, dtype=jnp.int32)


def _mask_features(feats, valid):
    return jnp.where(valid[:, None], feats, 0.0)


# ---------------------------------------------------------------------------
# rulebook resolution
#
# The coordinate lookup — not the gather-GEMM — dominates a sparse conv on
# TPU when done via searchsorted hash probes (measured 0.47 s vs 0.013 s for
# the GEMM at V=65k): searchsorted lowers to ~log2(V) serial random gathers
# per query. The TPU-idiomatic replacement is a DENSE int32 scatter/gather
# table over the (static) spatial grid: one scatter of V row ids, then the
# K*V rulebook queries are single full-rate gathers. The table is transient
# (B*D*H*W+1 int32, ~380 MB at the Waymo stage-1 grid) and gated by
# PCSEQ_DENSE_TABLE_CAP; larger grids fall back to the hash path.
# ---------------------------------------------------------------------------

_DENSE_TABLE_CAP = int(os.environ.get("PCSEQ_DENSE_TABLE_CAP", 300_000_000))


def _use_dense_table(spatial_shape, batch_size):
    D, H, W = spatial_shape
    return batch_size * D * H * W <= _DENSE_TABLE_CAP


def _dense_coord_table(st: SparseTensor):
    """[B*D*H*W + 1] int32 row-id table, -1 = empty; invalid rows land in
    the sentinel slot L."""
    D, H, W = st.spatial_shape
    L = st.batch_size * D * H * W
    c = st.coords
    lin = ((c[:, 0] * D + c[:, 1]) * H + c[:, 2]) * W + c[:, 3]
    lin = jnp.where(st.valid, lin, L)
    v = c.shape[0]
    return jnp.full(L + 1, -1, jnp.int32).at[lin].set(
        jnp.arange(v, dtype=jnp.int32))


def _dense_lookup(table, spatial_shape, batch_size, q, q_valid):
    """Row index of the exact coord match for each [M, 4] query (or -1)."""
    D, H, W = spatial_shape
    L = batch_size * D * H * W
    dims = jnp.asarray([batch_size, D, H, W], jnp.int32)
    ok = q_valid & jnp.all((q >= 0) & (q < dims[None, :]), axis=-1)
    lin = ((q[:, 0] * D + q[:, 1]) * H + q[:, 2]) * W + q[:, 3]
    lin = jnp.where(ok, lin, L)
    return jnp.where(ok, table[lin], -1)


def _lookup_coords(st: SparseTensor, q, q_valid):
    """Exact-match rulebook lookup: dense table when the grid fits, else
    the sorted-hash path (hash_graph.coord_lookup)."""
    if _use_dense_table(st.spatial_shape, st.batch_size):
        tab = _dense_coord_table(st)
        return _dense_lookup(tab, st.spatial_shape, st.batch_size, q, q_valid)
    table = hash_graph.build_coord_table(st.coords, st.valid)
    return hash_graph.coord_lookup(table, q, q_valid)


# ---------------------------------------------------------------------------
# gather-MM core with a gather-only custom VJP
#
# Autodiff of feats[idx] is a scatter-add — which XLA serializes on TPU
# (measured ~0.6 s for one [30k, 128] scatter; a train step runs hundreds
# of gather-grads, and this dominated the 15.9 s/step CenterPoint r4
# number). The transpose of a rulebook gather is ANOTHER rulebook gather
# through the reverse rulebook (for a submanifold conv the reverse of
# kernel offset k is the mirrored offset K-1-k; for strided/inverse convs
# it is the opposite-direction lookup), so the whole backward is
# gather+MXU too:
#   dfeats[i] = sum_k dY[idx_rev_k[i]] @ W_k^T
#   dW_k      = gather_k(feats)^T @ dY
# ---------------------------------------------------------------------------


def _scan_gather_mm(feats, idx_all, weights, transpose_w=False):
    v = feats.shape[0]

    def body(carry, inp):
        idx, w = inp
        ok = idx >= 0
        g = jnp.where(ok[:, None], feats[jnp.clip(idx, 0, v - 1)], 0.0)
        w = w.T if transpose_w else w
        return carry + jnp.dot(g, w, preferred_element_type=jnp.float32), None

    cout = weights.shape[1] if transpose_w else weights.shape[2]
    # the `feats.ravel()[0] * 0` term ties the carry's varying-manual-axes
    # type to feats under shard_map (a plain zeros carry is 'unvarying' and
    # scan rejects the carry-in/carry-out mismatch)
    out0 = jnp.zeros((idx_all.shape[1], cout), jnp.float32) + \
        feats.ravel()[0].astype(jnp.float32) * 0
    out, _ = jax.lax.scan(body, out0, (idx_all, weights))
    return out.astype(feats.dtype)


@jax.custom_vjp
def _rulebook_mm(feats, idx_fwd, idx_rev, weights):
    """sum_k gather(feats, idx_fwd[k]) @ weights[k], with a gather-only
    backward through ``idx_rev`` (the reverse rulebook: idx_rev[k][i] = j
    iff idx_fwd[k][j] = i)."""
    return _scan_gather_mm(feats, idx_fwd, weights)


def _rulebook_mm_fwd(feats, idx_fwd, idx_rev, weights):
    return _scan_gather_mm(feats, idx_fwd, weights), (feats, idx_fwd, idx_rev, weights)


def _rulebook_mm_bwd(res, dy):
    feats, idx_fwd, idx_rev, weights = res
    v = feats.shape[0]
    dfeats = _scan_gather_mm(dy, idx_rev, weights, transpose_w=True)

    def body_w(_, idx):
        ok = idx >= 0
        g = jnp.where(ok[:, None], feats[jnp.clip(idx, 0, v - 1)], 0.0)
        return None, jnp.dot(g.T, dy, preferred_element_type=jnp.float32)

    _, dw = jax.lax.scan(body_w, None, idx_fwd)
    return dfeats.astype(feats.dtype), None, None, dw.astype(weights.dtype)


_rulebook_mm.defvjp(_rulebook_mm_fwd, _rulebook_mm_bwd)


def _tie_vma(weights, feats):
    """Tie the weights' varying-manual-axes type to feats BEFORE the
    custom-VJP core: under shard_map, replicated params entering a
    custom_vjp would otherwise skip the broadcast-transpose psum on their
    cotangent (the vma checker then rejects the un-replicated grads). The
    add is outside the custom function, so its transpose restores the psum;
    outside shard_map XLA folds the +0."""
    return weights + feats.ravel()[0].astype(weights.dtype) * 0


def _mirror_rulebook(idx_all, kernel_size):
    """Reverse rulebook of a SUBMANIFOLD conv: offset k's transpose is the
    mirrored offset K-1-k (valid for odd kernel sizes, where
    offs[K-1-k] - center == -(offs[k] - center))."""
    ks = (kernel_size,) * 3 if isinstance(kernel_size, int) else tuple(kernel_size)
    if any(s % 2 == 0 for s in ks):
        return None
    return idx_all[::-1]


def build_subm_rulebook(st: SparseTensor, kernel_size=3):
    """[K, V] rulebook for a submanifold conv on ``st``'s coordinate set.

    Depends only on (coords, valid, spatial_shape): every subm conv in a
    stage shares one rulebook (coords are unchanged by subm convs), which
    amortizes the dominant lookup cost across the stage — the reference's
    spconv engine does the same by caching indice pairs per indice_key
    (ops/spconv/conv.py:113, get_indice_pairs)."""
    offs = kernel_offsets(kernel_size)
    k = offs.shape[0]
    if isinstance(kernel_size, int):
        ks = (kernel_size,) * 3
    else:
        ks = tuple(kernel_size)
    center = jnp.asarray([(s - 1) // 2 for s in ks], dtype=jnp.int32)
    v = st.coords.shape[0]
    delta = offs - center[None, :]  # [K, 3]
    zyx = st.coords[None, :, 1:4] + delta[:, None, :]  # [K, V, 3]
    b = jnp.broadcast_to(st.coords[None, :, 0:1], (k, v, 1))
    q = jnp.concatenate([b, zyx], axis=-1).reshape(k * v, 4)
    q_valid = jnp.broadcast_to(st.valid[None, :], (k, v)).reshape(-1)
    return _lookup_coords(st, q, q_valid).reshape(k, v)


def subm_conv3d(st: SparseTensor, weights, bias=None, kernel_size=3, precision=None, rulebook=None):
    """Submanifold sparse conv: output coords == input coords
    (spconv SubMConv3d; reference ops/spconv/conv.py:113 + ops.py:109).

    weights: [K, Cin, Cout]. ``rulebook`` ([K, V] from build_subm_rulebook)
    lets convs on the same coordinate set share one lookup.
    """
    feats = _mask_features(st.features, st.valid)
    idx_all = rulebook if rulebook is not None else build_subm_rulebook(st, kernel_size)
    idx_rev = _mirror_rulebook(idx_all, kernel_size)
    if idx_rev is not None:
        out = _rulebook_mm(feats, idx_all, idx_rev, _tie_vma(weights, feats))
    else:  # even kernel: no mirror — plain autodiff (scatter) path
        out = _scan_gather_mm(feats, idx_all, weights)
    if bias is not None:
        out = out + bias[None, :]
    out = _mask_features(out, st.valid)
    return SparseTensor(out, st.coords, st.valid, st.spatial_shape, st.batch_size)


def _downsample_coords(st: SparseTensor, kernel_size, stride, padding, out_cap):
    """Active output coordinates of a strided sparse conv: every out position
    whose receptive field touches an input (spconv get_indice_pairs
    semantics, ops/spconv/ops.py:46)."""
    if isinstance(kernel_size, int):
        kernel_size = (kernel_size,) * 3
    if isinstance(stride, int):
        stride = (stride,) * 3
    if isinstance(padding, int):
        padding = (padding,) * 3
    offs = kernel_offsets(kernel_size)  # [K, 3]
    k = offs.shape[0]
    stride_a = jnp.asarray(stride, dtype=jnp.int32)
    pad_a = jnp.asarray(padding, dtype=jnp.int32)
    out_shape = tuple(
        (st.spatial_shape[i] + 2 * padding[i] - kernel_size[i]) // stride[i] + 1
        for i in range(3)
    )

    # candidate out coords: (in + pad - off) / stride where divisible
    zyx = st.coords[:, 1:4][None, :, :] + pad_a[None, None, :] - offs[:, None, :]  # [K, V, 3]
    div_ok = jnp.all(zyx % stride_a[None, None, :] == 0, axis=-1)
    op = zyx // stride_a[None, None, :]
    in_bounds = jnp.all(
        (op >= 0) & (op < jnp.asarray(out_shape, dtype=jnp.int32)[None, None, :]), axis=-1
    )
    ok = div_ok & in_bounds & st.valid[None, :]
    b = jnp.broadcast_to(st.coords[:, 0][None, :], ok.shape)

    Do, Ho, Wo = out_shape
    L = st.batch_size * Do * Ho * Wo
    if L <= _DENSE_TABLE_CAP:
        # dense dedup: scatter occupancy, compact via sized nonzero (linear
        # index ascending == lexicographic coord order, matching the sort
        # path). ~10x faster than the 27V-row sort at backbone scale.
        lin = ((b * Do + op[..., 0]) * Ho + op[..., 1]) * Wo + op[..., 2]
        lin = jnp.where(ok, lin, L).reshape(-1)
        occ = jnp.zeros(L + 1, bool).at[lin].set(True)
        occ = occ[:L]
        take = jnp.nonzero(occ, size=out_cap, fill_value=0)[0].astype(jnp.int32)
        count = jnp.sum(occ.astype(jnp.int32))
        out_valid = jnp.arange(out_cap, dtype=jnp.int32) < jnp.minimum(count, out_cap)
        ob = take // (Do * Ho * Wo)
        rem = take % (Do * Ho * Wo)
        oz = rem // (Ho * Wo)
        oy = (rem // Wo) % Ho
        ox = rem % Wo
        out_coords = jnp.where(
            out_valid[:, None], jnp.stack([ob, oz, oy, ox], axis=-1), -1)
        return out_coords, out_valid, out_shape

    cand = jnp.concatenate([b[..., None], op], axis=-1).reshape(k * ok.shape[1], 4)
    ok_flat = ok.reshape(-1)
    # route invalid candidates to a sentinel so unique treats them as one row
    cand = jnp.where(ok_flat[:, None], cand, jnp.int32(2 ** 24))
    inverse, _, _ = grid_utils.unique_rows(cand)
    # representative (min flat index) per group, then take first out_cap rows
    # ordered by coordinate via segment_min of candidate rows
    n_groups = cand.shape[0]
    rep_coord = segment_ops.segment_min_or(cand, inverse, n_groups, jnp.int32(2 ** 24))
    occupied = rep_coord[:, 0] < jnp.int32(2 ** 24)
    # compact to out_cap: groups are in lexicographic coord order already.
    # fill rows (beyond the occupied count) must be invalid, so derive the
    # mask from the count rather than from occupied[take].
    take = jnp.nonzero(occupied, size=out_cap, fill_value=n_groups - 1)[0]
    count = jnp.sum(occupied.astype(jnp.int32))
    out_valid = jnp.arange(out_cap, dtype=jnp.int32) < jnp.minimum(count, out_cap)
    out_coords = jnp.where(out_valid[:, None], rep_coord[take], -1)
    return out_coords, out_valid, out_shape


def sparse_conv3d(st: SparseTensor, weights, bias=None, kernel_size=3, stride=2, padding=1, out_cap=None, precision=None):
    """Strided sparse conv (spconv SparseConv3d): grows/downsamples the
    active set; out_cap bounds the output table (default: input capacity)."""
    if isinstance(kernel_size, int):
        ks = (kernel_size,) * 3
    else:
        ks = tuple(kernel_size)
    if isinstance(stride, int):
        stride = (stride,) * 3
    if isinstance(padding, int):
        padding = (padding,) * 3
    v = st.features.shape[0]
    out_cap = out_cap or v
    out_coords, out_valid, out_shape = _downsample_coords(st, ks, stride, padding, out_cap)

    offs = kernel_offsets(ks)
    k = offs.shape[0]
    stride_a = jnp.asarray(stride, dtype=jnp.int32)
    pad_a = jnp.asarray(padding, dtype=jnp.int32)

    feats = _mask_features(st.features, st.valid)

    zyx = out_coords[None, :, 1:4] * stride_a[None, None, :] - pad_a[None, None, :] + offs[:, None, :]
    b = jnp.broadcast_to(out_coords[None, :, 0:1], (k, out_cap, 1))
    q = jnp.concatenate([b, zyx], axis=-1).reshape(k * out_cap, 4)
    q_valid = jnp.broadcast_to(out_valid[None, :], (k, out_cap)).reshape(-1)
    idx_all = _lookup_coords(st, q, q_valid).reshape(k, out_cap)

    # reverse rulebook (gather-only backward): input voxel i feeds output
    # idx_rev[k][i] at offset k, where out = (in + pad - off_k) / stride
    out_st = SparseTensor(
        jnp.zeros((out_cap, 1), feats.dtype), out_coords, out_valid,
        out_shape, st.batch_size)
    rzyx = st.coords[None, :, 1:4] + pad_a[None, None, :] - offs[:, None, :]
    rdiv = jnp.all(rzyx % stride_a[None, None, :] == 0, axis=-1)  # [K, V]
    rop = rzyx // stride_a[None, None, :]
    rb = jnp.broadcast_to(st.coords[None, :, 0:1], (k, v, 1))
    rq = jnp.concatenate([rb, rop], axis=-1).reshape(k * v, 4)
    rq_valid = (jnp.broadcast_to(st.valid[None, :], (k, v)) & rdiv).reshape(-1)
    idx_rev = _lookup_coords(out_st, rq, rq_valid).reshape(k, v)

    out = _rulebook_mm(feats, idx_all, idx_rev, _tie_vma(weights, feats))
    if bias is not None:
        out = out + bias[None, :]
    out = _mask_features(out, out_valid)
    return SparseTensor(out, out_coords, out_valid, out_shape, st.batch_size)


def sparse_inverse_conv3d(st: SparseTensor, target: SparseTensor, weights, bias=None, kernel_size=3, stride=2, padding=1, precision=None):
    """Inverse (transposed) sparse conv onto known target coords — the UNet
    decoder path (spconv SparseInverseConv3d, spconv_unet.py). For each
    target voxel, accumulates contributions from the coarse voxels whose
    forward receptive field covers it."""
    if isinstance(kernel_size, int):
        ks = (kernel_size,) * 3
    else:
        ks = tuple(kernel_size)
    if isinstance(stride, int):
        stride = (stride,) * 3
    if isinstance(padding, int):
        padding = (padding,) * 3
    offs = kernel_offsets(ks)
    k = offs.shape[0]
    stride_a = jnp.asarray(stride, dtype=jnp.int32)
    pad_a = jnp.asarray(padding, dtype=jnp.int32)

    feats = _mask_features(st.features, st.valid)
    v = feats.shape[0]
    t_cap = target.features.shape[0]

    # coarse voxel c contributes to fine voxel f through offset o when
    # c * stride - pad + o == f  =>  c == (f + pad - o) / stride
    zyx = target.coords[None, :, 1:4] + pad_a[None, None, :] - offs[:, None, :]
    div_ok = jnp.all(zyx % stride_a[None, None, :] == 0, axis=-1)  # [K, T]
    cc_ = zyx // stride_a[None, None, :]
    b = jnp.broadcast_to(target.coords[None, :, 0:1], (k, t_cap, 1))
    q = jnp.concatenate([b, cc_], axis=-1).reshape(k * t_cap, 4)
    q_valid = (jnp.broadcast_to(target.valid[None, :], (k, t_cap)) & div_ok).reshape(-1)
    idx_all = _lookup_coords(st, q, q_valid).reshape(k, t_cap)
    idx_all = jnp.where(div_ok, idx_all, -1)

    # reverse rulebook: coarse voxel c feeds fine voxel at
    # c*stride - pad + off_k (gather-only backward)
    rzyx = st.coords[None, :, 1:4] * stride_a[None, None, :] - pad_a[None, None, :] + offs[:, None, :]
    rb = jnp.broadcast_to(st.coords[None, :, 0:1], (k, v, 1))
    rq = jnp.concatenate([rb, rzyx], axis=-1).reshape(k * v, 4)
    rq_valid = jnp.broadcast_to(st.valid[None, :], (k, v)).reshape(-1)
    idx_rev = _lookup_coords(target, rq, rq_valid).reshape(k, v)

    out = _rulebook_mm(feats, idx_all, idx_rev, _tie_vma(weights, feats))
    if bias is not None:
        out = out + bias[None, :]
    out = _mask_features(out, target.valid)
    return SparseTensor(out, target.coords, target.valid, target.spatial_shape, target.batch_size)


def sparse_maxpool3d(st: SparseTensor, kernel_size=3, stride=2, padding=1, out_cap=None):
    """Sparse max pooling (spconv indice_maxpool, ops/spconv/ops.py:162)."""
    if isinstance(kernel_size, int):
        ks = (kernel_size,) * 3
    else:
        ks = tuple(kernel_size)
    if isinstance(stride, int):
        stride = (stride,) * 3
    if isinstance(padding, int):
        padding = (padding,) * 3
    v = st.features.shape[0]
    out_cap = out_cap or v
    out_coords, out_valid, out_shape = _downsample_coords(st, ks, stride, padding, out_cap)

    offs = kernel_offsets(ks)
    k = offs.shape[0]
    stride_a = jnp.asarray(stride, dtype=jnp.int32)
    pad_a = jnp.asarray(padding, dtype=jnp.int32)
    feats = _mask_features(st.features, st.valid)
    neg = jnp.asarray(-jnp.inf, feats.dtype)

    zyx = out_coords[None, :, 1:4] * stride_a[None, None, :] - pad_a[None, None, :] + offs[:, None, :]
    b = jnp.broadcast_to(out_coords[None, :, 0:1], (k, out_cap, 1))
    q = jnp.concatenate([b, zyx], axis=-1).reshape(k * out_cap, 4)
    q_valid = jnp.broadcast_to(out_valid[None, :], (k, out_cap)).reshape(-1)
    idx_all = _lookup_coords(st, q, q_valid).reshape(k, out_cap)

    def body(carry, idx):
        ok = idx >= 0
        g = jnp.where(ok[:, None], feats[jnp.clip(idx, 0, v - 1)], neg)
        return jnp.maximum(carry, g), None

    out0 = jnp.full((out_cap, feats.shape[1]), neg, feats.dtype) + feats.ravel()[0] * 0
    out, _ = jax.lax.scan(body, out0, idx_all)
    out = jnp.where(jnp.isfinite(out), out, 0.0)
    out = _mask_features(out, out_valid)
    return SparseTensor(out, out_coords, out_valid, out_shape, st.batch_size)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def grid_densify(L, feats, valid, lin):
    """[V, C] rows -> [L, C] dense grid; each VALID row owns exactly one
    cell (voxel coords are unique by construction — duplicate cells would
    silently keep the last scatter).

    Gather formulation: a [V, C] float scatter lowers to a slow serialized
    scatter on TPU (measured 0.6 s at V=30k, C=128 — it dominated the whole
    CenterPoint forward); instead scatter only V int32 row ids into the
    dense cell->row table and GATHER feature rows per dense cell (row v ->
    zeros via a sentinel row), which runs at HBM bandwidth. The custom VJP
    keeps the BACKWARD a gather too (dfeats[i] = dY[lin[i]]); autodiff
    would emit an [L, C] -> [V, C] scatter-add."""
    v = feats.shape[0]
    l = jnp.where(valid, lin, L)
    table = jnp.full(L + 1, v, jnp.int32).at[l].set(
        jnp.arange(v, dtype=jnp.int32), mode="drop")
    fz = jnp.concatenate(
        [jnp.where(valid[:, None], feats, 0.0),
         jnp.zeros((1, feats.shape[1]), feats.dtype)], axis=0)
    return fz[table[:L]]


def _grid_densify_fwd(L, feats, valid, lin):
    return grid_densify(L, feats, valid, lin), (valid, lin)


def _grid_densify_bwd(L, res, dy):
    valid, lin = res
    g = dy[jnp.clip(lin, 0, L - 1)]
    return jnp.where(valid[:, None], g, 0.0), None, None


grid_densify.defvjp(_grid_densify_fwd, _grid_densify_bwd)


def to_dense(st: SparseTensor):
    """Densify the sparse table into [B, D, H, W, C]
    (SparseConvTensor.dense(), used by HeightCompression) via
    ``grid_densify`` — gather-only in both directions."""
    D, H, W = st.spatial_shape
    B = st.batch_size
    b, z, y, x = st.coords[:, 0], st.coords[:, 1], st.coords[:, 2], st.coords[:, 3]
    lin = ((b * D + z) * H + y) * W + x
    L = B * D * H * W
    dense = grid_densify(L, st.features, st.valid, lin)
    return dense.reshape(B, D, H, W, st.features.shape[1])
