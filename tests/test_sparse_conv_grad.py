"""Gradient parity for the gather-only sparse-conv backward.

The custom VJPs (ops/sparse_conv._rulebook_mm / grid_densify) replace
autodiff's scatter-add backward with reverse-rulebook gathers; these tests
pin them against plain JAX autodiff of the same forward math (the
_scan_gather_mm path, whose backward IS the scatter formulation) on random
sparse tensors — exact agreement expected up to f32 reduction order.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pcseqlearning_tpu.ops import sparse_conv as sc


def _rand_st(rng, v_cap=64, n=48, shape=(6, 7, 8), B=2, C=5):
    coords = np.stack([
        rng.randint(0, B, n), rng.randint(0, shape[0], n),
        rng.randint(0, shape[1], n), rng.randint(0, shape[2], n)], 1)
    coords = np.unique(coords, axis=0)
    n = len(coords)
    c_pad = np.full((v_cap, 4), -1, np.int32)
    c_pad[:n] = coords
    valid = np.zeros(v_cap, bool)
    valid[:n] = True
    feats = np.where(valid[:, None], rng.randn(v_cap, C), 0).astype(np.float32)
    return sc.SparseTensor(jnp.asarray(feats), jnp.asarray(c_pad),
                           jnp.asarray(valid), shape, B)


def test_subm_grad_matches_autodiff(rng):
    st = _rand_st(rng)
    K, Cin, Cout = 27, st.features.shape[1], 6
    w = jnp.asarray(rng.randn(K, Cin, Cout).astype(np.float32))
    idx = sc.build_subm_rulebook(st, 3)
    idx_rev = sc._mirror_rulebook(idx, 3)
    dy = jnp.asarray(rng.randn(st.features.shape[0], Cout).astype(np.float32))

    def loss_custom(f, w):
        return jnp.sum(sc._rulebook_mm(f, idx, idx_rev, w) * dy)

    def loss_ad(f, w):
        return jnp.sum(sc._scan_gather_mm(f, idx, w) * dy)

    gf_c, gw_c = jax.grad(loss_custom, argnums=(0, 1))(st.features, w)
    gf_a, gw_a = jax.grad(loss_ad, argnums=(0, 1))(st.features, w)
    np.testing.assert_allclose(gf_c, gf_a, atol=1e-4)
    np.testing.assert_allclose(gw_c, gw_a, atol=1e-4)


@pytest.mark.parametrize("stride,pad,ks", [(2, 1, 3), (2, 0, 2), ((2, 2, 2), 1, 3)])
def test_strided_grad_matches_autodiff(rng, stride, pad, ks):
    st = _rand_st(rng)
    K = int(np.prod((ks,) * 3 if isinstance(ks, int) else ks))
    Cin, Cout = st.features.shape[1], 4
    w = jnp.asarray(rng.randn(K, Cin, Cout).astype(np.float32))

    def out_custom(f, w):
        st2 = st._replace(features=f)
        o = sc.sparse_conv3d(st2, w, kernel_size=ks, stride=stride, padding=pad)
        return o.features

    # naive: same rulebook, plain autodiff (scatter backward)
    ks_t = (ks,) * 3 if isinstance(ks, int) else tuple(ks)
    s_t = (stride,) * 3 if isinstance(stride, int) else tuple(stride)
    p_t = (pad,) * 3 if isinstance(pad, int) else tuple(pad)
    oc, ov, _ = sc._downsample_coords(st, ks_t, s_t, p_t, st.features.shape[0])
    offs = sc.kernel_offsets(ks_t)
    k = offs.shape[0]
    zyx = oc[None, :, 1:4] * jnp.asarray(s_t)[None, None, :] - \
        jnp.asarray(p_t)[None, None, :] + offs[:, None, :]
    b = jnp.broadcast_to(oc[None, :, 0:1], (k, oc.shape[0], 1))
    q = jnp.concatenate([b, zyx], -1).reshape(-1, 4)
    qv = jnp.broadcast_to(ov[None, :], (k, oc.shape[0])).reshape(-1)
    idx = sc._lookup_coords(st, q, qv).reshape(k, oc.shape[0])

    def out_ad(f, w):
        f = jnp.where(st.valid[:, None], f, 0.0)
        o = sc._scan_gather_mm(f, idx, w)
        return jnp.where(ov[:, None], o, 0.0)

    dy = jnp.asarray(rng.randn(st.features.shape[0], Cout).astype(np.float32))
    np.testing.assert_allclose(out_custom(st.features, w), out_ad(st.features, w),
                               atol=1e-5)
    gf_c, gw_c = jax.grad(lambda f, w: jnp.sum(out_custom(f, w) * dy),
                          argnums=(0, 1))(st.features, w)
    gf_a, gw_a = jax.grad(lambda f, w: jnp.sum(out_ad(f, w) * dy),
                          argnums=(0, 1))(st.features, w)
    np.testing.assert_allclose(gf_c, gf_a, atol=1e-4)
    np.testing.assert_allclose(gw_c, gw_a, atol=1e-4)


def test_inverse_grad_matches_autodiff(rng):
    st = _rand_st(rng)
    coarse = sc.sparse_conv3d(
        st, jnp.asarray(rng.randn(27, 5, 4).astype(np.float32)),
        kernel_size=3, stride=2, padding=1)
    K, Cin, Cout = 27, 4, 3
    w = jnp.asarray(rng.randn(K, Cin, Cout).astype(np.float32))
    dy = jnp.asarray(rng.randn(st.features.shape[0], Cout).astype(np.float32))

    def loss_custom(f, w):
        o = sc.sparse_inverse_conv3d(coarse._replace(features=f), st, w,
                                     kernel_size=3, stride=2, padding=1)
        return jnp.sum(o.features * dy)

    gf_c, gw_c = jax.grad(loss_custom, argnums=(0, 1))(coarse.features, w)
    # finite-difference spot check on a few weight entries
    eps = 1e-3
    for (a, b_, c) in [(0, 0, 0), (13, 2, 1), (26, 3, 2)]:
        wp = w.at[a, b_, c].add(eps)
        wm = w.at[a, b_, c].add(-eps)
        fd = (loss_custom(coarse.features, wp) -
              loss_custom(coarse.features, wm)) / (2 * eps)
        np.testing.assert_allclose(gw_c[a, b_, c], fd, atol=2e-2, rtol=2e-2)
    # and on feature rows via JVP consistency: <grad_f, df> == d/dt loss(f+t df)
    df = jnp.asarray(rng.randn(*coarse.features.shape).astype(np.float32))
    fd = (loss_custom(coarse.features + eps * df, w) -
          loss_custom(coarse.features - eps * df, w)) / (2 * eps)
    np.testing.assert_allclose(jnp.vdot(gf_c, df), fd, atol=5e-2, rtol=2e-2)


def test_grid_densify_grad_matches_autodiff(rng):
    V, C, L = 40, 6, 200
    lin = jnp.asarray(rng.choice(L, V, replace=False).astype(np.int32))
    valid = jnp.asarray(rng.rand(V) > 0.3)
    feats = jnp.asarray(rng.randn(V, C).astype(np.float32))
    dy = jnp.asarray(rng.randn(L, C).astype(np.float32))

    def naive(f):
        dense = jnp.zeros((L, C), f.dtype)
        f = jnp.where(valid[:, None], f, 0.0)
        return dense.at[jnp.where(valid, lin, L - 1)].add(
            jnp.where(valid[:, None], f, 0.0))

    got = sc.grid_densify(L, feats, valid, lin)
    np.testing.assert_allclose(got, naive(feats), atol=1e-6)
    g_c = jax.grad(lambda f: jnp.sum(sc.grid_densify(L, f, valid, lin) * dy))(feats)
    g_a = jax.grad(lambda f: jnp.sum(naive(f) * dy))(feats)
    np.testing.assert_allclose(g_c, g_a, atol=1e-6)
