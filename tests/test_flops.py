"""analytic_flops (utils/flops.py) vs hand-counted FLOPs."""

import jax
import jax.numpy as jnp
import numpy as np

from pcseqlearning_tpu.utils.flops import analytic_flops


def test_matmul_flops():
    a = jnp.zeros((32, 64))
    b = jnp.zeros((64, 16))
    assert analytic_flops(jnp.matmul, a, b) == 2 * 32 * 64 * 16


def test_batched_dot_flops():
    a = jnp.zeros((4, 8, 16))
    b = jnp.zeros((4, 16, 32))
    got = analytic_flops(lambda x, y: jax.lax.batch_matmul(x, y), a, b)
    assert got == 2 * 4 * 8 * 16 * 32


def test_conv_flops():
    x = jnp.zeros((2, 10, 10, 8))  # NHWC
    import flax.linen as nn

    m = nn.Conv(12, (3, 3), padding="SAME")
    params = m.init(jax.random.PRNGKey(0), x)
    got = analytic_flops(lambda p, x: m.apply(p, x), params, x)
    # conv: 2 * out_elems * cin * k*k (+ bias add not counted)
    assert got == 2 * (2 * 10 * 10 * 12) * 8 * 9


def test_scan_multiplies_by_length():
    w = jnp.zeros((27, 8, 16))

    def f(x):
        def body(c, wk):
            return c + x @ wk, None
        out, _ = jax.lax.scan(body, jnp.zeros((5, 16)), w)
        return out

    got = analytic_flops(f, jnp.zeros((5, 8)))
    assert got == 27 * 2 * 5 * 8 * 16


def test_grad_counts_backward():
    a = jnp.zeros((16, 24))
    b = jnp.zeros((24, 8))

    def loss(a, b):
        return jnp.sum((a @ b) ** 2)

    fwd = analytic_flops(loss, a, b)
    tot = analytic_flops(lambda a, b: jax.grad(loss)(a, b), a, b)
    # backward of a matmul = two matmuls of equal cost
    assert tot >= 2 * fwd
