import os
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np, jax.numpy as jnp, jax
print("jax ok", jax.devices(), flush=True)
from pcseqlearning_tpu.preprocessing.ground_removal import _count_voxel_levels, _count_voxel_sort1
print("import ok", flush=True)
rng = np.random.RandomState(0)
N = 50_000
xyz = (rng.rand(N, 3) * np.array([80, 80, 3])).astype(np.float32)
fxyz = np.concatenate([np.zeros((N, 1), np.float32), xyz], axis=1)
base = np.asarray([0.10, 0.10, 0.03])
mn = xyz.min(0)
for solve_cap in (1 << 21, 2000, 100):
    print("cap", solve_cap, flush=True)
    s, n_occ = _count_voxel_levels(jnp.asarray(fxyz), N, fxyz, solve_cap)
    print("  got", s, n_occ, flush=True)
