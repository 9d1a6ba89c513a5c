"""Batched closed-form 3x3 symmetric eigensolver, Procrustes rotation solve,
and rigid-transform utilities.

Replaces the reference's in-kernel CUDA 3x3 SVD
(/root/reference/pcdet/ops/hybrid_geop/src/svd3_cuda_device.h) and the f64
``torch.linalg.svd``/``eigh`` calls in the registration/plane-fitting hot
loops (registration_utils.py:167-177, preprocessor_utils.py:69).

TPU design: pure VPU element-wise math (Cardano eigenvalues + cross-product
eigenvectors) — no LAPACK-style iteration, fully batched and fusable. f32
with mean-centered inputs is standard practice on TPU; the reference's f64 is
compensated here by (a) callers centering data before covariance accumulation
and (b) degeneracy-robust eigenvector extraction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# XLA lowers f32 matmuls to reduced (bf16-class) input precision by default
# on TPU-style backends; every 3x3 product here is correctness-critical and
# tiny, so force full f32 precision throughout this module.
_HI = jax.lax.Precision.HIGHEST

_EPS = 1e-12


def _cross(a, b):
    return jnp.cross(a, b)


def _normalize(v, eps=_EPS):
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    return v * jax.lax.rsqrt(jnp.maximum(n2, eps)), n2[..., 0]


def _any_orthonormal(u):
    """A unit vector orthogonal to unit vector u (batched)."""
    # pick the canonical axis least aligned with u
    au = jnp.abs(u)
    # one-hot of argmin component
    m = jnp.argmin(au, axis=-1)
    e = jax.nn.one_hot(m, 3, dtype=u.dtype)
    v = _cross(u, e)
    v, _ = _normalize(v)
    return v


def eigh3x3(A):
    """Eigendecomposition of symmetric 3x3 matrices (batched).

    Args:
        A: [..., 3, 3] symmetric.
    Returns:
        (eigvals [..., 3] ascending, eigvecs [..., 3, 3] with COLUMNS as
        eigenvectors) — same convention as torch.linalg.eigh / jnp.linalg.eigh.
    """
    A = 0.5 * (A + jnp.swapaxes(A, -1, -2))
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a11, a12, a22 = A[..., 1, 1], A[..., 1, 2], A[..., 2, 2]

    q = (a00 + a11 + a22) / 3.0
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = (b00 * b00 + b11 * b11 + b22 * b22) / 6.0 + (a01 * a01 + a02 * a02 + a12 * a12) / 3.0
    p = jnp.sqrt(jnp.maximum(p2, 0.0))
    scale = jnp.maximum(jnp.abs(q), p)
    iso = p <= 1e-7 * jnp.maximum(scale, 1e-30)  # (near-)isotropic matrix

    p_safe = jnp.where(iso, 1.0, p)
    c00, c11, c22 = b00 / p_safe, b11 / p_safe, b22 / p_safe
    c01, c02, c12 = a01 / p_safe, a02 / p_safe, a12 / p_safe
    detB = (
        c00 * (c11 * c22 - c12 * c12)
        - c01 * (c01 * c22 - c12 * c02)
        + c02 * (c01 * c12 - c11 * c02)
    )
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    two_pi_3 = 2.0943951023931953
    lam2 = q + 2.0 * p * jnp.cos(phi)
    lam0 = q + 2.0 * p * jnp.cos(phi + two_pi_3)
    lam1 = 3.0 * q - lam0 - lam2
    lam0 = jnp.where(iso, q, lam0)
    lam1 = jnp.where(iso, q, lam1)
    lam2 = jnp.where(iso, q, lam2)

    eye = jnp.broadcast_to(jnp.eye(3, dtype=A.dtype), A.shape)

    def eigvec_of(lam):
        M = A - lam[..., None, None] * eye
        r0, r1, r2 = M[..., 0, :], M[..., 1, :], M[..., 2, :]
        c01 = _cross(r0, r1)
        c02 = _cross(r0, r2)
        c12 = _cross(r1, r2)
        n01 = jnp.sum(c01 * c01, axis=-1)
        n02 = jnp.sum(c02 * c02, axis=-1)
        n12 = jnp.sum(c12 * c12, axis=-1)
        ns = jnp.stack([n01, n02, n12], axis=-1)
        cs = jnp.stack([c01, c02, c12], axis=-2)
        best = jnp.argmax(ns, axis=-1)
        v = jnp.take_along_axis(cs, best[..., None, None], axis=-2)[..., 0, :]
        nbest = jnp.max(ns, axis=-1)
        v, _ = _normalize(v)
        # degenerate if the best cross product is ~0 relative to matrix scale
        m2 = jnp.sum(M * M, axis=(-1, -2))
        degen = nbest <= 1e-12 * jnp.maximum(m2 * m2, 1e-30)
        return v, degen

    v2, d2 = eigvec_of(lam2)
    # fallback for fully isotropic: canonical basis
    ez = jnp.zeros_like(v2).at[..., 2].set(1.0)
    v2 = jnp.where((iso | d2)[..., None], ez, v2)

    v0, d0 = eigvec_of(lam0)
    # orthogonalize v0 against v2; if degenerate (lam0 ~ lam1), any unit
    # vector orthogonal to v2 is a valid eigenvector of the repeated pair
    v0 = v0 - jnp.sum(v0 * v2, axis=-1, keepdims=True) * v2
    v0n, n0 = _normalize(v0)
    v0_fb = _any_orthonormal(v2)
    bad0 = iso | d0 | (n0 <= 1e-12)
    v0 = jnp.where(bad0[..., None], v0_fb, v0n)

    v1 = _cross(v2, v0)
    v1, _ = _normalize(v1)

    vecs = jnp.stack([v0, v1, v2], axis=-1)  # columns
    # Rayleigh-quotient refinement: Cardano roots of (near-)repeated
    # eigenvalues carry O(sqrt(eps)) error in f32, but v^T A v is exact for
    # any unit vector in the (well-conditioned) eigenspace.
    Av = jnp.einsum("...ij,...jk->...ik", A, vecs, precision=_HI)
    vals = jnp.einsum("...ik,...ik->...k", vecs, Av, precision=_HI)
    # keep ascending order (refinement can perturb ties)
    vals = jnp.sort(vals, axis=-1)
    return vals, vecs


def _solve3x3(A, b, eps=1e-20):
    """Batched 3x3 linear solve via adjugate (Cramer); near-singular systems
    return 0 (caller falls back)."""
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a10, a11, a12 = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    a20, a21, a22 = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    c00 = a11 * a22 - a12 * a21
    c01 = a12 * a20 - a10 * a22
    c02 = a10 * a21 - a11 * a20
    det = a00 * c00 + a01 * c01 + a02 * c02
    adjT = jnp.stack(
        [
            jnp.stack([c00, a02 * a21 - a01 * a22, a01 * a12 - a02 * a11], axis=-1),
            jnp.stack([c01, a00 * a22 - a02 * a20, a02 * a10 - a00 * a12], axis=-1),
            jnp.stack([c02, a01 * a20 - a00 * a21, a00 * a11 - a01 * a10], axis=-1),
        ],
        axis=-2,
    )
    x = jnp.einsum("...ij,...j->...i", adjT, b, precision=_HI)
    safe = jnp.abs(det) > eps
    return jnp.where(safe[..., None], x / jnp.where(safe, det, 1.0)[..., None], 0.0)


def _exp_so3(w):
    """Batched Rodrigues: [..., 3] axis-angle -> [..., 3, 3]."""
    th2 = jnp.sum(w * w, axis=-1, keepdims=True)
    th = jnp.sqrt(jnp.maximum(th2, 1e-30))
    small = th2[..., 0] < 1e-12
    k = w / th
    kx, ky, kz = k[..., 0], k[..., 1], k[..., 2]
    zeros = jnp.zeros_like(kx)
    K = jnp.stack(
        [
            jnp.stack([zeros, -kz, ky], axis=-1),
            jnp.stack([kz, zeros, -kx], axis=-1),
            jnp.stack([-ky, kx, zeros], axis=-1),
        ],
        axis=-2,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    sin = jnp.sin(th)[..., None]
    cos1 = (1.0 - jnp.cos(th))[..., None]
    R = eye + sin * K + cos1 * jnp.matmul(K, K, precision=_HI)
    return jnp.where(small[..., None, None], eye, R)


def _newton_refine_rotation(R, M, steps=2):
    """Newton steps on SO(3) maximizing tr(R^T M); one step turns an O(1e-3)
    f32 eigh-based solve into O(1e-7). Derivation: S = R^T M; gradient is the
    axial vector of skew(S); Hessian is tr(sym(S)) I - sym(S)."""
    for _ in range(steps):
        S = jnp.matmul(jnp.swapaxes(R, -1, -2), M, precision=_HI)
        a = jnp.stack(
            [
                S[..., 2, 1] - S[..., 1, 2],
                S[..., 0, 2] - S[..., 2, 0],
                S[..., 1, 0] - S[..., 0, 1],
            ],
            axis=-1,
        )
        H = 0.5 * (S + jnp.swapaxes(S, -1, -2))
        tr = H[..., 0, 0] + H[..., 1, 1] + H[..., 2, 2]
        eye = jnp.broadcast_to(jnp.eye(3, dtype=M.dtype), H.shape)
        A = tr[..., None, None] * eye - H
        w = _solve3x3(A, a)
        R = jnp.matmul(R, _exp_so3(w), precision=_HI)
    return R


def procrustes_rotation(M, eps=1e-9):
    """Optimal proper rotation R maximizing tr(R^T M) (Kabsch/Procrustes).

    Equivalent to the reference's sign-corrected SVD solve
    (registration_utils.py:167-173): R = U diag(1, 1, det(UV^T)) V^T for
    M = U S V^T. Built from eigh3x3(M^T M) with rank-deficiency fallbacks
    (planar/linear correspondence sets), avoiding an iterative SVD.

    Args:
        M: [..., 3, 3] cross-covariance (sum_i p_i q_i^T convention: solves
           R p ~ q when used as R = procrustes_rotation(M)^T appropriately;
           here R maximizes tr(R^T M), i.e. q ~ M-aligned).
    Returns:
        R: [..., 3, 3] with det(R) = +1.
    """
    MtM = jnp.matmul(jnp.swapaxes(M, -1, -2), M, precision=_HI)
    d, V = eigh3x3(MtM)
    v0, v1, v2 = V[..., 0], V[..., 1], V[..., 2]
    # right-handed V basis
    v0 = _cross(v1, v2)
    v0, _ = _normalize(v0)

    u2 = jnp.einsum("...ij,...j->...i", M, v2, precision=_HI)
    u2, s2 = _normalize(u2, eps)
    # if the largest singular value is ~0 the whole matrix is ~0 -> identity
    tiny = s2 <= eps

    u1 = jnp.einsum("...ij,...j->...i", M, v1, precision=_HI)
    u1 = u1 - jnp.sum(u1 * u2, axis=-1, keepdims=True) * u2
    u1n, s1 = _normalize(u1, eps)
    u1_fb = _any_orthonormal(u2)
    u1 = jnp.where((s1 <= eps)[..., None], u1_fb, u1n)

    u0 = _cross(u1, u2)  # det([u0,u1,u2]) = +1 by construction

    R = (
        u0[..., :, None] * v0[..., None, :]
        + u1[..., :, None] * v1[..., None, :]
        + u2[..., :, None] * v2[..., None, :]
    )
    R = _newton_refine_rotation(R, M, steps=2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=M.dtype), R.shape)
    return jnp.where(tiny[..., None, None], eye, R)


def make_rigid(R, t):
    """Assemble [..., 4, 4] homogeneous transforms from R [...,3,3], t [...,3]."""
    shape = R.shape[:-2]
    T = jnp.zeros(shape + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def rigid_inverse(T):
    """Inverse of homogeneous transforms (reference cluster_tracking.py:67-78)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    RT = jnp.swapaxes(R, -1, -2)
    ti = -jnp.einsum("...ij,...j->...i", RT, t, precision=_HI)
    return make_rigid(RT, ti)


def apply_rigid(T, xyz):
    """Apply [...,4,4] (or [4,4]) transforms to [...,3] points."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return jnp.einsum("...ij,...j->...i", R, xyz, precision=_HI) + t


def rotation_angle(R):
    """Rotation angle of [..., 3, 3] matrices (cluster_tracking.py:53-60)."""
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    return jnp.arccos(jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0))
