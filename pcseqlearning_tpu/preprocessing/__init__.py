"""The unsupervised cluster-sequence extraction pipeline (the fork's core
contribution): ground removal -> multi-radius connected-component cluster
proposal -> per-cluster rigid registration & tracking.

Reference: /root/reference/pcdet/models/registration/ (SimpleReg driver and
preprocessors). Here each stage is a jit-compiled transform over fixed-
capacity padded tables; the per-sequence orchestration stays on host,
mirroring the reference's artifact-caching semantics.
"""

from .ground_removal import GroundPlaneRemover  # noqa: F401
from .cluster_proposal import ClusterProposal  # noqa: F401
from .cluster_tracking import ClusterTracking  # noqa: F401
from .simple_reg import SimpleReg  # noqa: F401

PREPROCESSORS = {
    "GroundPlaneRemover": GroundPlaneRemover,
    "ClusterProposal": ClusterProposal,
    "ClusterTracking": ClusterTracking,
}
