"""Pallas TPU kernels for the extraction hot path.

The north-star kernel strategy (BASELINE.json / SURVEY §2.1) replaces the
reference's CUDA ops with Pallas kernels. The first shipped kernel fuses
the batched pairwise-distance + bidirectional min/argmin of the
component-tiled ICP (preprocessing/tracking_batched._icp_level): the XLA
path materializes the [C, P, Q] distance matrix in HBM every ICP iteration
(~1 GB/iter at production tiles); the kernel keeps each component's [P, Q]
block in VMEM and writes only the [P]- and [Q]-sized reductions.

Layout note: coordinates are fed TRANSPOSED as [C, 4, P] / [C, 4, Q] so the
point axis rides the 128-wide lane dimension; the [P, Q] cross term is one
K=4 MXU contraction per component.

Semantics (matching tracking_batched._pair_d2 + masked row/col mins):
    d2[c, p, q] = ||a[c, p] - b[c, q]||^2
    fwd_d2[c, p] = min_q d2 (masked by b_mask), fwd_idx = argmin
    bwd_d2[c, q] = min_p d2 (masked by a_mask), bwd_idx = argmin
Masked-out rows give +inf / argmin 0.

Falls back to the XLA composition automatically off-TPU (CPU tests) or
when shapes don't tile; toggle with PCSEQ_PALLAS=0.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

_INF = float("inf")  # python literal: jnp constants would be captured consts in the kernel


def _xla_pair_min(a, b, a_mask, b_mask):
    hi = jax.lax.Precision.HIGHEST
    a2 = jnp.sum(a * a, axis=-1)
    b2 = jnp.sum(b * b, axis=-1)
    cross = jnp.einsum("cpd,cqd->cpq", a, b, precision=hi)
    d2 = a2[:, :, None] + b2[:, None, :] - 2.0 * cross
    d2f = jnp.where(b_mask[:, None, :], d2, _INF)
    fwd_d2 = jnp.min(d2f, axis=2)
    fwd_idx = jnp.argmin(d2f, axis=2).astype(jnp.int32)
    d2b = jnp.where(a_mask[:, :, None], d2, _INF)
    bwd_d2 = jnp.min(d2b, axis=1)
    bwd_idx = jnp.argmin(d2b, axis=1).astype(jnp.int32)
    return fwd_d2, fwd_idx, bwd_d2, bwd_idx


_BIG = 1e30  # sentinel for masked rows (Mosaic can't reshape i1 vectors,
# so masking is arithmetic on f32 0/1 masks; +-inf would make inf-inf NaNs)


def _kernel(at_ref, bt_ref, am_ref, bm_ref, fd_ref, fi_ref, bd_ref, bi_ref):
    # CB components per grid step: the per-step fixed cost (DMA setup +
    # Mosaic step overhead) dominated the CB=1 kernel — measured ~15 ms per
    # production-shape call regardless of C, i.e. ~4 us/step pure overhead.
    # Batching 8 components per step amortizes it 8x.
    at = at_ref[...]  # [CB, 4, P] (xyz rows + zero pad row)
    bt = bt_ref[...]  # [CB, 4, Q]
    # Mosaic can't lower mixed int/None fancy indexing on 3D values (it
    # becomes an unsupported gather) — use explicit slice/squeeze/expand
    def _row(v, i):  # [CB, 4, K] -> [CB, K]
        return jax.lax.squeeze(jax.lax.slice_in_dim(v, i, i + 1, axis=1), (1,))

    def _e1(v):  # [CB, K] -> [CB, 1, K]
        return jnp.expand_dims(v, 1)

    def _e2(v):  # [CB, K] -> [CB, K, 1]
        return jnp.expand_dims(v, 2)

    amf = jax.lax.squeeze(am_ref[...], (1,))  # [CB, P] f32 0/1
    bmf = jax.lax.squeeze(bm_ref[...], (1,))  # [CB, Q] f32 0/1
    # exact f32 distances via direct differences (no |a|^2+|b|^2-2ab
    # cancellation, no MXU precision trap) — [CB, P, Q] VPU ops in VMEM
    dx = _e2(_row(at, 0)) - _e1(_row(bt, 0))
    dy = _e2(_row(at, 1)) - _e1(_row(bt, 1))
    dz = _e2(_row(at, 2)) - _e1(_row(bt, 2))
    d2 = dx * dx + dy * dy + dz * dz
    cb, p, q = d2.shape
    iq = jax.lax.broadcasted_iota(jnp.int32, (cb, p, q), 2)
    ip = jax.lax.broadcasted_iota(jnp.int32, (cb, p, q), 1)
    d2f = d2 + _e1(1.0 - bmf) * _BIG
    mf = jnp.min(d2f, axis=2)
    # first-match argmin (ties -> lowest index, matching jnp.argmin)
    fi = jnp.min(jnp.where(d2f <= _e2(mf), iq, q), axis=2).astype(jnp.int32) % q
    d2b = d2 + _e2(1.0 - amf) * _BIG
    mb = jnp.min(d2b, axis=1)
    bi = jnp.min(jnp.where(d2b <= _e1(mb), ip, p), axis=1).astype(jnp.int32) % p
    fd_ref[...] = _e1(mf)
    fi_ref[...] = _e1(fi)
    bd_ref[...] = _e1(mb)
    bi_ref[...] = _e1(bi)


# VMEM budget for the [CB, P, Q] distance block (plus its masked variants)
_PAIR_VMEM_BUDGET = 4 * 1024 * 1024


def _pair_cb(C, P, Q):
    """Components per grid step: largest power-of-2 divisor of C whose
    [CB, P, Q] f32 block fits the VMEM budget."""
    cb = 1
    while (
        cb < 16
        and C % (cb * 2) == 0
        and (cb * 2) * P * Q * 4 <= _PAIR_VMEM_BUDGET
    ):
        cb *= 2
    return cb


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_pair_min(at, bt, a_maskf, b_maskf, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C, _, P = at.shape
    Q = bt.shape[2]
    CB = _pair_cb(C, P, Q)
    # [C, 1, P]-shaped 1D quantities: the TPU lowering needs the last two
    # block dims divisible by (8, 128) OR equal to the array dims — a
    # middle singleton satisfies the sublane rule exactly
    fd, fi, bd, bi = pl.pallas_call(
        _kernel,
        grid=(C // CB,),
        in_specs=[
            pl.BlockSpec((CB, 4, P), lambda c: (c, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CB, 4, Q), lambda c: (c, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CB, 1, P), lambda c: (c, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CB, 1, Q), lambda c: (c, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((CB, 1, P), lambda c: (c, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CB, 1, P), lambda c: (c, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CB, 1, Q), lambda c: (c, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CB, 1, Q), lambda c: (c, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((C, 1, P), jnp.float32),
            jax.ShapeDtypeStruct((C, 1, P), jnp.int32),
            jax.ShapeDtypeStruct((C, 1, Q), jnp.float32),
            jax.ShapeDtypeStruct((C, 1, Q), jnp.int32),
        ],
        interpret=interpret,
    )(at, bt, a_maskf.reshape(C, 1, P), b_maskf.reshape(C, 1, Q))
    return fd[:, 0], fi[:, 0], bd[:, 0], bi[:, 0]


def _use_pallas():
    if os.environ.get("PCSEQ_PALLAS", "1") == "0":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _prefer_xla_pair_min():
    """Chained-dependency microbenches on the v5e (r5) put the XLA
    composition at ~3.0-3.7 ms vs ~5.6-6.4 ms for the VPU kernel at the
    production walk shapes (C=2048, P=256, Q=512): the MXU cross-term +
    fused elementwise reductions beat 18 VPU passes over [P, Q] once HBM
    has the bandwidth for the [C, P, Q] temporaries. PCSEQ_PAIRMIN=pallas
    restores the kernel (e.g. for HBM-constrained shapes)."""
    return os.environ.get("PCSEQ_PAIRMIN", "xla") != "pallas"


def pair_min(a, b, a_mask, b_mask):
    """Fused batched pairwise-distance bidirectional min.

    a [C, P, 3], b [C, Q, 3], masks [C, P]/[C, Q] bool.
    Returns (fwd_d2 [C, P], fwd_idx [C, P], bwd_d2 [C, Q], bwd_idx [C, Q]).
    """
    C, P, _ = a.shape
    Q = b.shape[1]
    # VMEM slot budget: the kernel materializes ~3 [P, Q] f32 temporaries
    # (d2 + its two masked variants) per grid step; cap the block at ~4 MB
    # so e.g. ImplicitReconstructionHead's P = n*S, Q = n at n = 16k
    # (which passes the 128-divisibility gate) falls back to XLA instead of
    # asking Mosaic for a ~29 GB block (ADVICE r2, medium).
    tiles_ok = (
        P % 128 == 0 and Q % 128 == 0 and P * Q * 4 <= 4 * 1024 * 1024
    )
    if _prefer_xla_pair_min() or not (_use_pallas() and tiles_ok):
        return _xla_pair_min(a, b, a_mask, b_mask)
    at = jnp.concatenate(
        [jnp.swapaxes(a, 1, 2), jnp.zeros((C, 1, P), a.dtype)], axis=1
    ).astype(jnp.float32)
    bt = jnp.concatenate(
        [jnp.swapaxes(b, 1, 2), jnp.zeros((C, 1, Q), b.dtype)], axis=1
    ).astype(jnp.float32)
    fd, fi, bd, bi = _pallas_pair_min(
        at, bt, a_mask.astype(jnp.float32), b_mask.astype(jnp.float32)
    )
    # restore the +inf-where-none contract of the XLA path
    fd = jnp.where(fd >= _BIG * 0.5, jnp.inf, fd)
    bd = jnp.where(bd >= _BIG * 0.5, jnp.inf, bd)
    return fd, fi, bd, bi
