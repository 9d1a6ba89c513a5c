"""Analytic FLOP counting by jaxpr traversal.

``jax.stages.Lowered.cost_analysis()`` is unavailable through the axon
relay (AttributeError at runtime, BENCH_r04) and ``compile()`` builds a
second AOT executable that OOM-kills the remote compile helper — so MFU
numerators come from walking the jaxpr instead: every ``dot_general`` and
``conv_general_dilated`` (including inside scan/while/cond/pjit/custom-vjp
sub-jaxprs, with scan trip counts multiplied in) contributes
2 * prod(output) * contraction_size FLOPs. This counts EXECUTED matmul
FLOPs on padded tables — the right numerator for hardware-utilization MFU.
"""

from __future__ import annotations

import numpy as np


def _dot_flops(eqn):
    (lhs, rhs) = eqn.invars[:2]
    dnums = eqn.params["dimension_numbers"]
    (lc, rc), (lb, rb) = dnums
    lshape = lhs.aval.shape
    rshape = rhs.aval.shape
    batch = int(np.prod([lshape[i] for i in lb], dtype=np.int64)) if lb else 1
    contract = int(np.prod([lshape[i] for i in lc], dtype=np.int64)) if lc else 1
    m = int(np.prod([s for i, s in enumerate(lshape) if i not in lc and i not in lb],
                    dtype=np.int64))
    n = int(np.prod([s for i, s in enumerate(rshape) if i not in rc and i not in rb],
                    dtype=np.int64))
    return 2 * batch * m * n * contract


def _conv_flops(eqn):
    lhs, rhs = eqn.invars[:2]
    out = eqn.outvars[0]
    dnums = eqn.params["dimension_numbers"]
    fgc = int(eqn.params.get("feature_group_count", 1))
    bgc = int(eqn.params.get("batch_group_count", 1))
    rshape = rhs.aval.shape
    oshape = out.aval.shape
    # rhs layout per dnums.rhs_spec: (out_feat, in_feat/fgc, *spatial)
    rs = dnums.rhs_spec
    cin_per_group = rshape[rs[1]]
    kernel_spatial = int(np.prod([rshape[i] for i in rs[2:]], dtype=np.int64))
    out_elems = int(np.prod(oshape, dtype=np.int64))
    return 2 * out_elems * cin_per_group * kernel_spatial // max(bgc, 1)


def _jaxpr_flops(jaxpr):
    total = 0
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        if prim == "dot_general":
            total += _dot_flops(eqn)
        elif prim == "conv_general_dilated":
            total += _conv_flops(eqn)
        elif prim == "scan":
            inner = _jaxpr_flops(eqn.params["jaxpr"].jaxpr)
            total += inner * int(eqn.params["length"])
        elif prim == "while":
            # trip count unknowable statically; charge one body execution
            total += _jaxpr_flops(eqn.params["body_jaxpr"].jaxpr)
        elif prim == "cond":
            branches = eqn.params["branches"]
            total += max((_jaxpr_flops(b.jaxpr) for b in branches), default=0)
        else:
            for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
                sub = eqn.params.get(key)
                if sub is not None:
                    total += _jaxpr_flops(getattr(sub, "jaxpr", sub))
                    break
    return total


def analytic_flops(fn, *args, **kwargs):
    """Matmul/conv FLOPs of one call of ``fn(*args, **kwargs)`` (counts the
    whole program: forward + backward + optimizer when fn is a train step)."""
    import jax

    closed = jax.make_jaxpr(fn)(*args, **kwargs)
    return _jaxpr_flops(closed.jaxpr)
