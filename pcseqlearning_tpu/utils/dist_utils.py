"""Multi-host collectives & result merging.

Replaces the reference's torch.distributed plumbing
(/root/reference/pcdet/utils/commu_utils.py:49-182 pickle-tensor all_gather,
common_utils.py:286-377 NCCL init + tmpdir result merge) with jax-native
equivalents: `jax.distributed.initialize` + `multihost_utils` gathers inside
the SPMD model; pickle/file merging only for arbitrary python results.
"""

from __future__ import annotations

import os
import pickle
import tempfile
import time


def init_distributed(coordinator=None, num_processes=None, process_id=None):
    """Multi-host init (replaces init_dist_pytorch/init_dist_slurm). No-op on
    a single host."""
    import jax

    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num_processes <= 1:
        return 0, 1
    jax.distributed.initialize(
        coordinator_address=coordinator or os.environ.get("JAX_COORDINATOR", "localhost:1234"),
        num_processes=num_processes,
        process_id=process_id if process_id is not None else int(os.environ.get("JAX_PROCESS_ID", "0")),
    )
    return jax.process_index(), jax.process_count()


def get_dist_info():
    import jax

    return jax.process_index(), jax.process_count()


def all_gather_arrays(tree):
    """Gather identical-shaped pytrees from all hosts (replaces the
    padded-pickle-tensor all_gather, commu_utils.py:49-110)."""
    import jax
    from jax.experimental import multihost_utils

    if jax.process_count() == 1:
        return [tree]
    gathered = multihost_utils.process_allgather(tree)
    return [jax.tree_util.tree_map(lambda x: x[i], gathered) for i in range(jax.process_count())]


def average_reduce_value(value):
    """Mean of a host scalar across processes (commu_utils.py:141-182)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    if jax.process_count() == 1:
        return value
    g = multihost_utils.process_allgather(jnp.asarray(value))
    return float(jnp.mean(g))


def merge_results_dist(part_results, size, tmpdir=None):
    """Rank-0 file-based merge of arbitrary per-rank python results
    (common_utils.py:354-377 semantics: pickle to a shared tmpdir, barrier,
    rank 0 loads and flattens in rank order, truncates to dataset size)."""
    import jax
    from jax.experimental import multihost_utils

    rank, world = get_dist_info()
    if world == 1:
        return part_results[:size]
    tmpdir = tmpdir or os.path.join(tempfile.gettempdir(), "pcseq_dist_merge")
    os.makedirs(tmpdir, exist_ok=True)
    with open(os.path.join(tmpdir, f"result_part_{rank}.pkl"), "wb") as f:
        pickle.dump(part_results, f)
    multihost_utils.sync_global_devices("merge_results")
    if rank != 0:
        return None
    merged = []
    for r in range(world):
        path = os.path.join(tmpdir, f"result_part_{r}.pkl")
        for _ in range(100):
            if os.path.exists(path):
                break
            time.sleep(0.1)
        with open(path, "rb") as f:
            merged.append(pickle.load(f))
    # interleave rank-strided results back into dataset order
    ordered = []
    for i in range(max(len(m) for m in merged)):
        for r in range(world):
            if i < len(merged[r]):
                ordered.append(merged[r][i])
    return ordered[:size]
