"""A-B the fused-bottleneck Pallas chain vs plain XLA on the real TPU,
using bench.py's validated timing methodology (chained lax.fori_loop with a
carried scalar + device_get — block_until_ready does NOT synchronize
through the axon tunnel, see bench.py docstring).

Shapes are SimplePose-R50 @ 256x192 serving (batch 512 default):
  layer1 tail: 2 blocks @ 64x48, C=256, P=64   (the 21%-MFU HBM-bound stage)
  layer2 tail: 3 blocks @ 32x24, C=512, P=128
  layer3 tail: 5 blocks @ 16x12, C=1024, P=256

Usage: python exp/profile_fused2.py [batch] [stage_filter] [dtype_filter]
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
from bench import _bench_chain_static as _bench_chain  # noqa: E402  (chained-loop timing)
from vatl4pose_tpu.kernels.fused_bottleneck import (  # noqa: E402
    bottleneck_chain_reference, fused_bottleneck_chain)

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 512
STAGES = [  # (name, H, W, C, P, nb)
    ("layer1_tail", 64, 48, 256, 64, 2),
    ("layer2_tail", 32, 24, 512, 128, 3),
    ("layer3_tail", 16, 12, 1024, 256, 5),
]


def _rand(shape, dtype, rng):
    return jnp.asarray(rng.normal(0, 0.05, shape), dtype)


def make_loop(fn, x, ws):
    def make(K):
        @jax.jit
        def loop(x, *ws):
            def body(i, acc):
                out = fn(x * (1 + acc * 1e-20).astype(x.dtype), *ws)
                return acc + jnp.sum(out[0, 0, 0, :8].astype(jnp.float32))
            return lax.fori_loop(0, K, body, jnp.float32(0))
        return loop
    return make


def main():
    rng = np.random.default_rng(0)
    stage_f = sys.argv[2] if len(sys.argv) > 2 else ""
    dtype_f = sys.argv[3] if len(sys.argv) > 3 else ""
    print(f"devices: {jax.devices()}", file=sys.stderr)
    for dtype in (jnp.bfloat16, jnp.float32):
        dname = "bf16" if dtype == jnp.bfloat16 else "f32"
        if dtype_f and dname != dtype_f:
            continue
        for name, H, W, C, P, nb in STAGES:
            if stage_f and stage_f not in name:
                continue
            x = _rand((BATCH, H, W, C), dtype, rng)
            ws = (_rand((nb, C, P), dtype, rng),
                  jnp.abs(_rand((nb, P), jnp.float32, rng)) + 0.5,
                  _rand((nb, P), jnp.float32, rng),
                  _rand((nb, 3, 3, P, P), dtype, rng),
                  jnp.abs(_rand((nb, P), jnp.float32, rng)) + 0.5,
                  _rand((nb, P), jnp.float32, rng),
                  _rand((nb, P, C), dtype, rng),
                  jnp.abs(_rand((nb, C), jnp.float32, rng)) + 0.5,
                  _rand((nb, C), jnp.float32, rng))
            t_xla, _ = _bench_chain(
                make_loop(bottleneck_chain_reference, x, ws), x, *ws,
                iters=16)
            try:
                t_pl, _ = _bench_chain(
                    make_loop(fused_bottleneck_chain, x, ws), x, *ws,
                    iters=16)
                err = float(jnp.max(jnp.abs(
                    fused_bottleneck_chain(x, *ws).astype(jnp.float32)
                    - jax.jit(bottleneck_chain_reference)(
                        x, *ws).astype(jnp.float32))))
            except Exception as e:  # noqa: BLE001
                t_pl, err = float("nan"), f"{type(e).__name__}: {e}"
            gflops = 2 * BATCH * H * W * (C * P + 9 * P * P + P * C) * nb / 1e9
            hbm_gb = 2 * BATCH * H * W * C * x.dtype.itemsize / 1e9
            print(json.dumps({
                "stage": name, "dtype": dname, "batch": BATCH,
                "xla_ms": round(t_xla * 1e3, 2),
                "pallas_ms": round(t_pl * 1e3, 2) if t_pl == t_pl else None,
                "speedup": round(t_xla / t_pl, 3) if t_pl == t_pl else None,
                "gflops": round(gflops, 1),
                "stream_hbm_gb": round(hbm_gb, 3),
                "pallas_mfu_vs_197T": (round(gflops / t_pl / 197e3, 3)
                                       if t_pl == t_pl else None),
                "max_abs_err": err if isinstance(err, str) else round(err, 6),
            }), flush=True)


if __name__ == "__main__":
    main()
