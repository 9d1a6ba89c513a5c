"""SST: Single-stride Sparse Transformer over BEV pillars.

Rewrite of the reference SST stack (/root/reference/pcdet/models/
backbones_3d/sst.py + sst_utils.py + ops/sst/sst_ops.py): sparse pillars are
regrouped into fixed-capacity attention windows (the flat2window/window2flat
ops), multi-head self-attention runs within each window, and alternate blocks
shift the window partition by half a window (Swin-style).

TPU design: regrouping = lexicographic sort by window id + cumcount slot
assignment + one scatter into a dense [num_windows, window_cap, C] tensor —
the attention itself is a plain masked MHA batched over windows (pure MXU).
No gather/scatter CUDA kernels, no bucketing by occupancy (the reference
bins windows by size to bound padding; on TPU one padded bucket vectorizes
better than many small launches).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import grid_utils, segment_ops
from .layers import MaskedBatchNorm


def flat2window(feats, coords_xy, valid, window_size, num_windows_cap, window_cap, shift=False):
    """Scatter flat pillar features into dense per-window buckets.

    Args:
        feats: [P, C]; coords_xy: [P, 2] int32 BEV coords; valid: [P].
        window_size: int; shift: half-window partition shift.
    Returns:
        win_feats [Wn, L, C], win_mask [Wn, L], mapping (win_id [P], slot [P]).
    """
    p = feats.shape[0]
    off = window_size // 2 if shift else 0
    wcoords = (coords_xy + off) // window_size
    wc = jnp.where(valid[:, None], wcoords, jnp.int32(2 ** 24))
    # dense window ids via unique over (wx, wy)
    pad = jnp.zeros((p, 2), jnp.int32)
    inverse, _, _ = grid_utils.unique_rows(jnp.concatenate([wc, pad], axis=1))
    win_id = jnp.where(valid, inverse, num_windows_cap)
    # slot within the window: rank by (win_id, index)
    idx = jnp.arange(p, dtype=jnp.int32)
    sorted_w, sorted_i = jax.lax.sort((win_id, idx), num_keys=1)
    same = jnp.concatenate([jnp.zeros(1, jnp.int32), (sorted_w[1:] == sorted_w[:-1]).astype(jnp.int32)])
    # cumcount within runs
    run_start = jnp.where(same == 0, jnp.arange(p), 0)
    run_start = jax.lax.associative_scan(jnp.maximum, run_start)
    slot_sorted = jnp.arange(p, dtype=jnp.int32) - run_start
    slot = jnp.zeros(p, jnp.int32).at[sorted_i].set(slot_sorted)

    ok = valid & (win_id < num_windows_cap) & (slot < window_cap)
    flat_pos = jnp.where(ok, win_id * window_cap + slot, num_windows_cap * window_cap)
    c = feats.shape[-1]
    dense = jnp.zeros((num_windows_cap * window_cap + 1, c), feats.dtype)
    dense = dense.at[flat_pos].set(jnp.where(ok[:, None], feats, 0.0))
    mask = jnp.zeros(num_windows_cap * window_cap + 1, bool).at[flat_pos].set(ok)
    win_feats = dense[:-1].reshape(num_windows_cap, window_cap, c)
    win_mask = mask[:-1].reshape(num_windows_cap, window_cap)
    return win_feats, win_mask, (win_id, slot, ok)


def window2flat(win_feats, mapping, num_points):
    """Gather per-window features back to the flat pillar table."""
    win_id, slot, ok = mapping
    wn, L, c = win_feats.shape
    flat = win_feats.reshape(wn * L, c)
    pos = jnp.clip(win_id * L + slot, 0, wn * L - 1)
    out = flat[pos]
    return jnp.where(ok[:, None], out, 0.0)


class WindowMSA(nn.Module):
    """Masked multi-head self-attention within windows + FFN (one SST block,
    reference sst.py BasicShiftBlock)."""

    dim: int
    num_heads: int = 8
    ffn_mult: int = 2

    @nn.compact
    def __call__(self, x, mask, pos_embed, train=False):
        # x: [Wn, L, C]; mask: [Wn, L]
        h = x + pos_embed
        attn_mask = mask[:, None, None, :]  # broadcast over heads/queries
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.dim,
        )(h, h, mask=attn_mask)
        y = jnp.where(mask[..., None], y, 0.0)
        x = nn.LayerNorm()(x + y)
        f = nn.Dense(self.dim * self.ffn_mult)(x)
        f = nn.gelu(f)
        f = nn.Dense(self.dim)(f)
        x = nn.LayerNorm()(x + f)
        return jnp.where(mask[..., None], x, 0.0)


class SSTBackbone(nn.Module):
    """Single-stride sparse transformer over pillar features (reference
    backbones_3d/sst.py). Produces updated pillar features + a dense BEV map.
    """

    dim: int = 128
    num_blocks: int = 4
    window_size: int = 12
    num_heads: int = 8
    grid_size: tuple = (468, 468)  # BEV (nx, ny)
    window_cap: int = 144
    num_windows_cap: int = 2048

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        feats = batch_dict.get("pillar_features", batch_dict["voxel_features"])
        coords = batch_dict["voxel_coords"]  # (b, z, y, x)
        valid = batch_dict["voxel_valid"]
        b = coords[:, 0]
        xy = jnp.stack([coords[:, 3], coords[:, 2]], axis=1)
        # fold batch id into y so windows never span batch elements
        xy_b = xy.at[:, 1].add(b * (self.grid_size[1] + self.window_size * 2))

        x = nn.Dense(self.dim, use_bias=False)(feats)
        x = MaskedBatchNorm()(x, valid, train)
        x = nn.relu(x)

        for blk in range(self.num_blocks):
            shift = blk % 2 == 1
            wf, wm, mapping = flat2window(
                x, xy_b, valid, self.window_size, self.num_windows_cap,
                self.window_cap, shift=shift,
            )
            # positional embedding from in-window offsets
            off = self.window_size // 2 if shift else 0
            inwin = jnp.stack(
                [(xy_b[:, 0] + off) % self.window_size, (xy_b[:, 1] + off) % self.window_size],
                axis=1,
            ).astype(jnp.float32) / self.window_size
            pe = nn.Dense(self.dim, name=f"pos_embed_{blk}")(inwin)
            pe_w, _, _ = flat2window(
                pe, xy_b, valid, self.window_size, self.num_windows_cap,
                self.window_cap, shift=shift,
            )
            wf = WindowMSA(self.dim, self.num_heads, name=f"block_{blk}")(wf, wm, pe_w, train)
            x = window2flat(wf, mapping, x.shape[0])

        batch_dict["pillar_features"] = x
        batch_dict["voxel_features"] = x
        return batch_dict


BACKBONES_SST = {"SST": SSTBackbone, "SSTBackbone": SSTBackbone}
