"""Attribute coreset_selection's cold-call wall (BENCH_DETAIL
coreset_select_s_cold: 1.8 s in r4 vs 0.44 s in r2, with the persistent
cache demonstrably NOT hiding it).

Splits the first call into: host prep (bucketing/padding), device_put of
the (512, 2048) embedding, trace (jit lower), backend compile (or
persistent-cache load), and execution+fetch — each timed separately via
the same _coreset_run entry the production call uses.  A second process
run with the same cache dir distinguishes compile from cache-load.

Usage: python exp/profile_coreset_cold.py [--nocache]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

t_import0 = time.perf_counter()
import jax                                     # noqa: E402
import jax.numpy as jnp                        # noqa: E402

from vatl4pose_tpu.utils.runtime import setup_jax_cache  # noqa: E402

if "--nocache" not in sys.argv:
    setup_jax_cache()
from vatl4pose_tpu.al import selection         # noqa: E402
from vatl4pose_tpu.data.pipeline import bucket_size  # noqa: E402

print(f"imports {time.perf_counter() - t_import0:.2f}s "
      f"backend={jax.default_backend()}", flush=True)

rng = np.random.default_rng(0)
BATCH = 512
emb = rng.normal(0, 1, (BATCH, 2048)).astype(np.float32)
unc = rng.uniform(size=BATCH).astype(np.float32)
labeled = list(range(24))

# --- replicate coreset_selection's host prep + device transfer ----------
t0 = time.perf_counter()
nb = bucket_size(BATCH)
qb = bucket_size(26, buckets=(8, 16, 32, 64, 128, 256, 512, 1024,
                              2048, 4096))
qb = min(qb, BATCH)
emb_np = np.zeros((nb, emb.shape[1]), np.float32)
emb_np[:BATCH] = emb
unc_np = np.full(nb, -np.inf, np.float32)
unc_np[:BATCH] = unc
valid_np = np.zeros(nb, bool)
valid_np[:BATCH] = True
li_np = np.asarray(labeled, np.int32)
li_np = np.concatenate([li_np, np.full(nb - len(li_np), li_np[0],
                                       np.int32)])
t_host = time.perf_counter() - t0

t0 = time.perf_counter()
args_dev = [jax.device_put(a) for a in
            (emb_np, unc_np, valid_np, li_np,
             np.float32(0.5), np.float32(0.01), np.int32(0))]
jax.block_until_ready(args_dev)
t_put = time.perf_counter() - t0

kw = dict(mode="dynamic", query_size=qb, have_labeled=True,
          first_random=False)

t0 = time.perf_counter()
lowered = selection._coreset_run.lower(*args_dev, **kw)
t_trace = time.perf_counter() - t0

t0 = time.perf_counter()
compiled = lowered.compile()
t_compile = time.perf_counter() - t0

t0 = time.perf_counter()
picks = jax.device_get(compiled(*args_dev))
t_run1 = time.perf_counter() - t0

t0 = time.perf_counter()
picks = jax.device_get(compiled(*args_dev))
t_run2 = time.perf_counter() - t0

# and the production wrapper itself, warm (jit cache hit through
# coreset_selection's own prep)
t0 = time.perf_counter()
selection.coreset_selection(emb, unc, labeled, 26, 0.01, 0.5)
t_wrapper_warm = time.perf_counter() - t0

print(f"host_prep   {t_host * 1e3:8.1f} ms", flush=True)
print(f"device_put  {t_put * 1e3:8.1f} ms", flush=True)
print(f"trace       {t_trace * 1e3:8.1f} ms", flush=True)
print(f"compile     {t_compile * 1e3:8.1f} ms", flush=True)
print(f"run1(+get)  {t_run1 * 1e3:8.1f} ms", flush=True)
print(f"run2(+get)  {t_run2 * 1e3:8.1f} ms", flush=True)
print(f"wrapper_warm{t_wrapper_warm * 1e3:8.1f} ms", flush=True)
print(f"cold_total  {(t_host + t_put + t_trace + t_compile + t_run1) * 1e3:8.1f} ms",
      flush=True)
