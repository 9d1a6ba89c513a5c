"""Device-channel warmup for tunneled TPU backends.

On the axon (TPU-over-network) backend the FIRST device->host transfer of a
process stalls the whole transfer channel for minutes (measured 80-230 s for
a 1 KB readback; every H2D/D2H queued behind it waits). The stall is a
per-process one-off, so the fix is to trigger it as early as possible on a
background thread, overlapped with host-only work (scene/dataset loading,
config parsing) that needs no device traffic.

Call warm_d2h_async() right after process start; join_warm() (optional)
blocks until the channel is live.

ORDERING CONSTRAINT: the warm thread initializes the JAX backend. Any
``jax.distributed.initialize`` (dist_utils.init_distributed) MUST run
BEFORE warm_d2h_async() — JAX rejects distributed init after backend
creation (or silently yields local-only device visibility). tools/train.py
performs distributed init first for this reason.
"""

from __future__ import annotations

import threading
import time

_warm_thread = None

# measured H2D bandwidth in MB/s (None until the warm thread probes it).
# The tunnel's rate swings ~20-1000 MB/s with tenant load; wire-format
# decisions (utils/device_seq int16 quantization) consult this so a fast
# link skips the ~5 s of single-core host quantization that only pays for
# itself below ~150 MB/s.
h2d_mbps = None
warm_done = False


def warm_d2h_async():
    """Start the one-off first-D2H channel warm on a daemon thread."""
    global _warm_thread
    if _warm_thread is not None:
        return _warm_thread

    def _go():
        global h2d_mbps, warm_done
        try:
            import jax
            import jax.numpy as jnp
            import numpy as np

            np.asarray(jnp.zeros(8, jnp.float32) + 0)
            # H2D bandwidth probe: 16 MB is big enough to amortize the
            # per-transfer latency (~65 ms) yet costs <1 s at the slow end
            buf = np.ones(4 * 1024 * 1024, np.float32)
            t0 = time.time()
            jax.block_until_ready(jnp.asarray(buf))
            dt = max(time.time() - t0, 1e-3)
            h2d_mbps = buf.nbytes / 1e6 / dt
        except Exception:
            pass  # no device / CPU-only run: nothing to warm
        finally:
            warm_done = True

    _warm_thread = threading.Thread(
        target=_go, daemon=True, name="pcseq-d2h-warm")
    _warm_thread.start()
    return _warm_thread


def join_warm(timeout=None):
    if _warm_thread is not None:
        _warm_thread.join(timeout)
