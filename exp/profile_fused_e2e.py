"""End-to-end serving A-B: SimplePose-R50 @256x192 batch 512 forward,
exact Flax graph vs fused_eval (folded-BN stage tails) with the chain run
through plain XLA vs the Pallas kernel.  Chained-fori timing (bench.py).

Usage: python exp/profile_fused_e2e.py [impl ...]
  impl in exact|xla|conv|pallas (xla = einsum folded form, conv = 1x1-conv
  folded form — same math, different lowering/compile behavior)
"""

import json
import sys

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, ".")
from vatl4pose_tpu.utils.runtime import setup_jax_cache  # noqa: E402
setup_jax_cache()
from bench import _bench_chain_static as _bench_chain  # noqa: E402
from vatl4pose_tpu.models import SimplePose  # noqa: E402
from vatl4pose_tpu.models import resnet as resnet_mod  # noqa: E402

BATCH = 512


def main():
    which = sys.argv[1:] or ["exact", "xla", "pallas"]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (BATCH, 256, 192, 3)), jnp.bfloat16)
    exact = SimplePose(num_joints=17, num_layers=50, train=False)
    fused = SimplePose(num_joints=17, num_layers=50, train=False,
                       fused_eval=True)
    shapes = jax.eval_shape(
        lambda: exact.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 256, 192, 3), jnp.float32)))
    var = jax.tree.map(
        lambda a: jnp.asarray(rng.normal(0, 0.05, a.shape),
                              jnp.bfloat16 if a.dtype == jnp.float32
                              else a.dtype), shapes)

    def make(model):
        def mk(K):
            @jax.jit
            def loop(var, x):
                def body(i, acc):
                    hm = model.apply(var, x * (1 + acc * 1e-20
                                               ).astype(x.dtype))
                    return acc + jnp.sum(hm[0, 0, 0].astype(jnp.float32))
                return lax.fori_loop(0, K, body, jnp.float32(0))
            return loop
        return mk

    for name in which:
        resnet_mod.FUSE_IMPL = name if name != "exact" else "xla"
        model = exact if name == "exact" else fused
        dt, _ = _bench_chain(make(model), var, x, iters=8)
        print(json.dumps({"impl": name, "batch": BATCH,
                          "ms_per_batch": round(dt * 1e3, 2),
                          "samples_per_s": round(BATCH / dt, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
