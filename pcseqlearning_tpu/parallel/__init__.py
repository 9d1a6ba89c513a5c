"""SPMD utilities: mesh construction and sharded train steps.

The reference's only parallelism is DDP over NCCL
(/root/reference/tools/train.py:173-174, utils/common_utils.py:286-331).
The TPU-native equivalent (SURVEY.md §2.7): a `jax.sharding.Mesh` over the
data axis with the gradient all-reduce fused into the pjit-compiled train
step — no wrapper module, no explicit collectives in user code. A model
axis is provisioned for sharding wide BEV channels when configured.
"""

from .mesh import make_mesh, shard_batch, replicate  # noqa: F401
from .train_step import make_train_step, TrainState  # noqa: F401
