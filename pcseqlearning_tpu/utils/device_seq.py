"""Device-resident sequence point table shared across pipeline stages.

At reference scale (210 sweeps x ~35M points) every extraction stage used
to re-upload views of the same sequence through the tunneled TPU link
(~50 MB/s): proposal chunk tables, evaluation frame geometry, tracking
window packs — ~1-2 GB of duplicate H2D per steady pass. This module
uploads the (frame-sorted) flat [N, 4] table ONCE and serves every
downstream layout as a jitted on-device slice/gather:

  * ``chunk(f0, f1, cap)``      -> padded [cap, 4] + valid (proposal CC)
  * ``frame_table(p_cap)``      -> [F, p_cap, 4] + valid (evaluation,
                                   tracking windows); built on device from
                                   the flat table, cached

Only activates when the host array is frame-sorted (the standard
concatenated layout — FrameIndex's fast path); callers fall back to the
host pack path otherwise.

TPU-native counterpart of the reference's implicit GPU residency: torch
keeps the sequence tensor on device across the whole forward
(/root/reference/pcdet/models/registration/simple_reg.py:103-157), which a
host-orchestrated JAX pipeline must reproduce explicitly.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from .padding import bucket_size


@jax.jit
def _dequant_flat(q, n, mid, step):
    """int16 wire -> f32 resident table: col 0 is the exact frame id, cols
    1:4 are fixed-point offsets around ``mid``; pad rows get the 1e8
    sentinel every consumer expects."""
    iota = jnp.arange(q.shape[0], dtype=jnp.int32)
    valid = iota < n
    f = q[:, 0:1].astype(jnp.float32)
    xyz = q[:, 1:4].astype(jnp.float32) * step + mid[None, :]
    flat = jnp.concatenate([f, xyz], axis=1)
    return jnp.where(valid[:, None], flat, 1e8)


@functools.partial(jax.jit, static_argnames=("cap",), donate_argnums=())
def _slice_rows(flat, cstart, off, length, cap):
    """[cap, 4] window of the flat table whose rows
    [cstart+off, cstart+off+length) are the live span (slots
    [off, off+length)); everything else masked to the 1e8 sentinel.
    ``cstart``/``off`` are precomputed on host so no traced value needs a
    readback (dynamic_slice would clamp near the table end, shifting the
    window — the host accounts for that shift in ``off``)."""
    win = jax.lax.dynamic_slice(flat, (cstart, 0), (cap, flat.shape[1]))
    iota = jnp.arange(cap, dtype=jnp.int32)
    valid = (iota >= off) & (iota < off + length)
    win = jnp.where(valid[:, None], win, 1e8)
    return win, valid


@functools.partial(jax.jit, static_argnames=("F", "p_cap"))
def _frame_table(flat, starts, counts, F, p_cap):
    """[F, p_cap, 4] per-frame table gathered from the flat sorted array.

    Rows beyond a frame's count read the sentinel; gather indices are
    clamped in-range so the single [F*p_cap] row gather stays defined."""
    n = flat.shape[0]
    iota = jnp.arange(p_cap, dtype=jnp.int32)[None, :]
    rows = starts[:F, None] + iota  # [F, p_cap]
    valid = iota < counts[:F, None]
    rows = jnp.clip(rows, 0, n - 1)
    tab = flat[rows.reshape(-1)].reshape(F, p_cap, flat.shape[1])
    tab = jnp.where(valid[..., None], tab, 1e8)
    return tab, valid


@functools.partial(jax.jit, static_argnames=("F", "p_cap"))
def _aux_frame_table(flat, starts, counts, F, p_cap):
    n = flat.shape[0]
    iota = jnp.arange(p_cap, dtype=jnp.int32)[None, :]
    rows = starts[:F, None] + iota
    valid = iota < counts[:F, None]
    rows = jnp.clip(rows, 0, n - 1)
    tab = flat[rows.reshape(-1)].reshape(F, p_cap)
    return jnp.where(valid, tab, jnp.zeros((), flat.dtype))


def _compact_rows_impl(flat, keep, n_keep, cap):
    """Stable-compact kept rows to the front: [cap, 4] device table of the
    rows where ``keep`` (original order preserved), pads at 1e8. ``keep``
    covers the real rows (pads beyond it drop)."""
    n_pad = flat.shape[0]
    key = jnp.ones(n_pad, jnp.int32).at[: keep.shape[0]].set(
        1 - keep.astype(jnp.int32))
    iota = jnp.arange(n_pad, dtype=jnp.int32)
    _, perm = jax.lax.sort((key, iota), num_keys=2)  # ties keep row order
    out = flat[perm[:cap]]
    valid = jnp.arange(cap, dtype=jnp.int32) < n_keep
    return jnp.where(valid[:, None], out, 1e8)


_compact_rows = functools.partial(jax.jit, static_argnames=("cap",))(
    _compact_rows_impl)


@functools.partial(jax.jit, static_argnames=("cap1", "cap2"))
def _compact_rows2(flat, keep1, n1, cap1, keep2, n2, cap2):
    """Both downstream compactions in ONE executable (the axon relay pays
    a queue-dependent first-run cost per executable, so the ground stage
    hands off its two filtered tables with one program)."""
    return (_compact_rows_impl(flat, keep1, n1, cap1),
            _compact_rows_impl(flat, keep2, n2, cap2))


@functools.partial(jax.jit, static_argnames=("cap1", "cap2"))
def _compact_rows2_aux(flat, aux, keep1, n1, cap1, keep2, n2, cap2):
    """_compact_rows2 plus per-point aux columns compacted by keep1's
    permutation in the same program (the aux gather shares the sort —
    stacking the columns onto `flat` would change its dtype/width for
    every downstream view, so they ride separately)."""
    n_pad = flat.shape[0]
    key = jnp.ones(n_pad, jnp.int32).at[: keep1.shape[0]].set(
        1 - keep1.astype(jnp.int32))
    iota = jnp.arange(n_pad, dtype=jnp.int32)
    _, perm = jax.lax.sort((key, iota), num_keys=2)
    valid1 = jnp.arange(cap1, dtype=jnp.int32) < n1
    out1 = jnp.where(valid1[:, None], flat[perm[:cap1]], 1e8)
    aux_pad = jnp.zeros((n_pad, aux.shape[1]), aux.dtype).at[: aux.shape[0]].set(aux)
    aux1 = jnp.where(valid1[:, None], aux_pad[perm[:cap1]], 0)
    return out1, aux1, _compact_rows_impl(flat, keep2, n2, cap2)


class DeviceSeq:
    """One H2D upload; every stage layout is an on-device view."""

    def __init__(self, fxyz_np, frame_np):
        frame = np.asarray(frame_np).reshape(-1)
        self.ok = len(frame) > 0 and bool((np.diff(frame) >= 0).all())
        self._host_id = id(fxyz_np)
        self.n = len(frame)
        if not self.ok:
            return
        self._init_index(frame)
        n_pad = bucket_size(self.n)
        arr = np.asarray(fxyz_np, np.float32)
        # int16 fixed-point wire for big sequences: the tunneled H2D runs
        # at ~20-250 MB/s depending on tenant load, and the 35M-point f32
        # table is 571 MB — the dominant per-sequence cost at the slow end.
        # 5 mm quantization sits 16x under the pipeline's own finest grid
        # (8 cm ingest subsample / 0.1 m ground + ICP voxels), and the
        # resident f32 table is reconstructed on device in one pass.
        # PCSEQ_WIRE_QUANT=0 forces the exact f32 wire.
        # quant guard: col 0 must be exact under the int16 cast — frame ids
        # drive _init_index row ranges and all per-frame window slicing, so
        # require nonnegative integral values (checked on a stride sample;
        # any fractional/negative id falls back to the exact f32 wire)
        col0 = arr[:: max(1, self.n // 65536), 0] if self.n else arr[:0, 0]
        # the int16 wire trades ~0.13 s/M-row of single-core host
        # quantization for half the wire bytes — a win only when the
        # tunnel is slow. Below ~100 MB/s measured H2D the quant pays for
        # itself; at the fast end (~1 GB/s observed) it COSTS ~5 s per
        # 35M-point sequence. warmup.h2d_mbps holds the probe result; an
        # unprobed link keeps the quant (safe for the slow case).
        from . import warmup as _warmup

        bw = _warmup.h2d_mbps
        link_slow = bw is None or bw < float(
            os.environ.get("PCSEQ_WIRE_QUANT_MBPS", 100.0))
        env_q = os.environ.get("PCSEQ_WIRE_QUANT", "")
        quant = (
            self.n > 2_000_000
            and (link_slow or env_q == "1")  # "1" forces (quality A/Bs)
            and env_q != "0"
            and arr.shape[0] > 0
            and float(arr[:, 0].max()) < 32000.0
            and col0.size > 0
            and float(col0.min()) >= 0.0
            and bool(np.all(col0 == np.floor(col0)))
        )
        if quant:
            lo = arr[:, 1:4].min(0)
            hi = arr[:, 1:4].max(0)
            mid = (lo + hi) * 0.5
            step = np.float32(max(0.005, float((hi - lo).max()) / 65000.0))
            q = np.zeros((n_pad, 4), np.int16)
            q[: self.n, 0] = np.round(arr[:, 0]).astype(np.int16)
            q[: self.n, 1:4] = np.clip(
                np.round((arr[:, 1:4] - mid[None, :]) / step),
                -32768, 32767).astype(np.int16)
            self.flat = _dequant_flat(
                jnp.asarray(q), jnp.asarray(self.n, jnp.int32),
                jnp.asarray(mid, jnp.float32), jnp.asarray(step, jnp.float32))
        else:
            flat = np.full((n_pad, 4), 1e8, np.float32)
            flat[: self.n] = arr
            self.flat = jnp.asarray(flat)
        self._init_device()

    def _init_index(self, frame):
        # frame is sorted (self.ok) — searchsorted gives every frame's
        # start in O(F log N) instead of np.unique's O(N) pass (~0.5 s on
        # a 9M-row int64 column)
        self.num_frames = int(frame[-1]) + 1
        edges = np.searchsorted(
            frame, np.arange(self.num_frames + 2, dtype=frame.dtype))
        self.counts = np.diff(edges)
        self.starts = edges[:-1].copy()

    def _init_device(self):
        self._starts_d = jnp.asarray(self.starts.astype(np.int32))
        self._counts_d = jnp.asarray(self.counts.astype(np.int32))
        self._ft_cache = {}

    @classmethod
    def from_device(cls, flat_dev, frame_np, host_key=None):
        """Wrap an ALREADY-RESIDENT padded flat table (e.g. a device
        compact of a larger table) — zero H2D. ``frame_np`` is the host
        frame column of the real rows (must be frame-sorted);
        ``host_key`` is the host array future callers will pass to
        get_device_seq/matches."""
        self = cls.__new__(cls)
        frame = np.asarray(frame_np).reshape(-1)
        self.ok = len(frame) > 0 and bool((np.diff(frame) >= 0).all())
        self._host_id = id(host_key) if host_key is not None else None
        self.n = len(frame)
        if not self.ok:
            return self
        assert flat_dev.shape[0] >= self.n, (flat_dev.shape, self.n)
        self._init_index(frame)
        self.flat = flat_dev
        self._init_device()
        return self

    def compact(self, keep_dev, n_keep):
        """Device table of the kept rows (order preserved), as a padded
        [bucket(n_keep), 4] flat array — the input for from_device."""
        cap = bucket_size(max(int(n_keep), 1))
        return _compact_rows(
            self.flat, keep_dev, jnp.asarray(int(n_keep), jnp.int32), cap)

    def compact2(self, keep1, n1, keep2, n2):
        """Two compactions, one dispatch (see _compact_rows2)."""
        cap1 = bucket_size(max(int(n1), 1))
        cap2 = bucket_size(max(int(n2), 1))
        return _compact_rows2(
            self.flat, keep1, jnp.asarray(int(n1), jnp.int32), cap1,
            keep2, jnp.asarray(int(n2), jnp.int32), cap2)

    def compact2_aux(self, aux, keep1, n1, keep2, n2):
        """compact2 plus [N, A] aux columns filtered by keep1 (same sort,
        same program); returns (flat1, aux1, flat2)."""
        cap1 = bucket_size(max(int(n1), 1))
        cap2 = bucket_size(max(int(n2), 1))
        return _compact_rows2_aux(
            self.flat, aux, keep1, jnp.asarray(int(n1), jnp.int32), cap1,
            keep2, jnp.asarray(int(n2), jnp.int32), cap2)

    def matches(self, fxyz_np):
        return self.ok and id(fxyz_np) == self._host_id

    def chunk(self, f0, f1):
        """Device ([cap, 4], valid) for frames [f0, f1) plus host ints
        (length, off): the chunk's rows occupy slots [off, off+length) of
        the window (off is 0 except near the table end)."""
        f1 = min(f1, self.num_frames)
        start = int(self.starts[f0])
        length = int(self.starts[f1] - self.starts[f0]) if f1 > f0 else 0
        cap = bucket_size(max(length, 1))
        n_pad = self.flat.shape[0]
        cstart = min(start, max(n_pad - cap, 0))
        off = start - cstart
        win, valid = _slice_rows(
            self.flat, jnp.asarray(cstart, jnp.int32),
            jnp.asarray(off, jnp.int32), jnp.asarray(length, jnp.int32), cap,
        )
        return win, valid, length, off

    def frame_table(self, p_cap=None):
        """Device ([F, p_cap, 4], [F, p_cap] valid), cached per p_cap."""
        if p_cap is None:
            p_cap = bucket_size(int(self.counts.max()) if self.n else 1)
        if p_cap not in self._ft_cache:
            self._ft_cache[p_cap] = _frame_table(
                self.flat, self._starts_d, self._counts_d,
                self.num_frames, p_cap,
            )
        return self._ft_cache[p_cap] + (p_cap,)

    def aux_frame_table(self, vals, p_cap=None):
        """Per-frame [F, p_cap] view of a per-point array (e.g. the
        stationary flags): ONE flat upload (skipped when ``vals`` is
        already a device array padded to the table height) + the same
        on-device gather as frame_table. Pad slots read False/0."""
        if p_cap is None:
            p_cap = bucket_size(int(self.counts.max()) if self.n else 1)
        if isinstance(vals, jnp.ndarray) and vals.shape[0] == self.flat.shape[0]:
            flat_d = vals
        else:
            vals = np.asarray(vals)
            flat = np.zeros(self.flat.shape[0], vals.dtype)
            flat[: self.n] = vals
            flat_d = jnp.asarray(flat)
        return _aux_frame_table(
            flat_d, self._starts_d, self._counts_d,
            self.num_frames, p_cap,
        )


def get_device_seq(seq_dict, fxyz_np, frame_np):
    """Fetch-or-build the shared DeviceSeq for this (filtered) sequence.

    Stored in seq_dict under ``_dev_seq`` keyed by the host array identity;
    returns None when the layout is not frame-sorted (callers use their
    host pack path)."""
    ds = seq_dict.get("_dev_seq")
    if ds is not None and ds.matches(fxyz_np):
        return ds if ds.ok else None
    ds = DeviceSeq(fxyz_np, frame_np)
    seq_dict["_dev_seq"] = ds
    return ds if ds.ok else None
