"""Per-stage forward profile of SimplePose-R50 @ 256x192 on the real TPU.

Attributes wall time and MFU to every pipeline segment — stem (7x7/s2 +
maxpool), each residual stage layer1..4, the deconv head — in f32 and
bf16, and A/Bs two rewrites:
  - head lowering: subpixel (dense 2x2 conv + phase interleave,
    models/layers.py) vs dilated (XLA lhs_dilation)
  - stem lowering: direct conv7x7/s2 on C_in=3 vs the exact
    space-to-depth rewrite (pad kernel 7->8, S2D input 2x2 -> conv4x4/s1
    on C_in=12 — identical math, better MXU packing)

Timing uses the chained-fori methodology (bench.py) because
block_until_ready does not synchronize through the axon tunnel.
FLOPs come from XLA cost analysis of the jitted single-stage program.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python exp/profile_forward.py
Output: one JSON line per stage -> exp/FORWARD_PROFILE.md
"""
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vatl4pose_tpu.config import Cfg
from vatl4pose_tpu.models import build_sppe
from vatl4pose_tpu.models.layers import (TorchConvTranspose,
                                         max_pool_same_torch,
                                         torch_batchnorm)
from vatl4pose_tpu.models.resnet import Bottleneck

V5E_BF16_PEAK = 197e12
BATCH = int(os.environ.get("PROFILE_BATCH", 512))       # tiny for CPU smoke
ITERS = int(os.environ.get("PROFILE_ITERS", 8))
SMOKE = os.environ.get("PROFILE_SMOKE", "") == "1"      # skip .md rewrite


class Head(nn.Module):
    """SimplePose deconv head with an explicit lowering switch; submodule
    names match SimplePose so its param subtree applies unchanged."""
    num_joints: int = 17
    subpixel: bool = True

    def setup(self):
        self.deconv1 = TorchConvTranspose(256, subpixel=self.subpixel)
        self.bn_d1 = torch_batchnorm(None, True)
        self.deconv2 = TorchConvTranspose(256, subpixel=self.subpixel)
        self.bn_d2 = torch_batchnorm(None, True)
        self.deconv3 = TorchConvTranspose(256, subpixel=self.subpixel)
        self.bn_d3 = torch_batchnorm(None, True)
        self.final_layer = nn.Conv(self.num_joints, (1, 1))

    def __call__(self, x):
        out = nn.relu(self.bn_d1(self.deconv1(x)))
        out = nn.relu(self.bn_d2(self.deconv2(out)))
        out = nn.relu(self.bn_d3(self.deconv3(out)))
        return self.final_layer(out)


class Stem(nn.Module):
    """ResNet stem; names match ResNet so the preact subtree applies."""

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, name="conv1")(x)
        x = torch_batchnorm("bn1", True)(x)
        x = nn.relu(x)
        return max_pool_same_torch(x, 3, 2, 1)


def stem_s2d_fn(kernel, bn_vars):
    """Exact space-to-depth stem as a plain function of the conv1 kernel
    (7,7,3,64) and bn1 vars: pad kernel to 8x8, regroup phases ->
    (4,4,12,64), S2D the 3-padded input -> conv4x4 valid on C_in=12."""
    k8 = jnp.pad(kernel, ((0, 1), (0, 1), (0, 0), (0, 0)))
    # K'[a,b,(p,q,c),o] = K8[2a+p, 2b+q, c, o]
    k8 = k8.reshape(4, 2, 4, 2, *kernel.shape[2:])       # a,p,b,q,c,o
    kp = k8.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, -1, kernel.shape[3])

    scale, bias, mean, var = bn_vars

    def fn(x):
        N, H, W, C = x.shape
        xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
        y = xp.reshape(N, (H + 6) // 2, 2, (W + 6) // 2, 2, C)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(
            N, (H + 6) // 2, (W + 6) // 2, 4 * C)
        out = jax.lax.conv_general_dilated(
            y, kp.astype(y.dtype), window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        inv = jax.lax.rsqrt(var + 1e-5)
        out = (out - mean) * (inv * scale) + bias
        out = nn.relu(out)
        return max_pool_same_torch(out, 3, 2, 1)

    return fn


class Stage(nn.Module):
    """One residual stage of R50; block names match ResNet's flat naming
    (layer{li}_{bi}) so the preact subtree applies unchanged."""
    li: int                      # 1-based
    in_ch: int
    n_blocks: int

    @nn.compact
    def __call__(self, x):
        planes = (64, 128, 256, 512)[self.li - 1]
        stride = 1 if self.li == 1 else 2
        in_ch = self.in_ch
        for bi in range(self.n_blocks):
            s = stride if bi == 0 else 1
            has_ds = (bi == 0) and (s != 1 or in_ch != planes * 4)
            x = Bottleneck(planes, s, has_ds, False,
                           name=f"layer{self.li}_{bi}")(x)
            in_ch = planes * 4
        return x


def chain_time(fn, x, iters=ITERS):
    """Median-of-3 per-iteration wall of a chained fori program."""
    def prog(x0):
        def body(i, acc):
            y = fn((x0 * (1.0 + acc * 1e-12)).astype(x0.dtype))
            return acc + jnp.mean(y.astype(jnp.float32))
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
    f = jax.jit(prog)
    float(f(x))                                    # compile + warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(x))
        ts.append((time.perf_counter() - t0) / iters)
    return float(np.median(ts))


def flops_of(fn, x):
    c = jax.jit(fn).lower(x).compile().cost_analysis()
    if isinstance(c, (list, tuple)):
        c = c[0]
    return float(c.get("flops", 0.0)) if c else 0.0


def subtree(tree, names):
    return {c: {k: v for k, v in tree[c].items() if k in names
                or any(k.startswith(n) for n in names)}
            for c in tree}


def main():
    preset = Cfg({"IMAGE_SIZE": [256, 192], "HEATMAP_SIZE": [64, 48],
                  "SIGMA": 2, "NUM_JOINTS": 17, "TYPE": "simple"})
    mcfg = Cfg({"TYPE": "SimplePose",
                "NUM_DECONV_FILTERS": [256, 256, 256], "NUM_LAYERS": 50})
    model = build_sppe(mcfg, preset, train=False)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (BATCH, 256, 192, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x[:1])
    head_vars = {c: {k: v for k, v in variables[c].items() if k != "preact"}
                 for c in variables}
    pre = {c: variables[c]["preact"] for c in variables}

    jbackbone = jax.jit(lambda v, a: model.apply(v, a, method="backbone"))
    feat = jbackbone(variables, x)
    feat.block_until_ready()

    # intermediate activations for per-stage inputs (computed once, f32)
    stem_m = Stem()
    stem_vars = subtree(pre, ("conv1", "bn1"))
    f0 = jax.jit(lambda a: stem_m.apply(stem_vars, a))(x)
    stage_ms = [Stage(li=i, in_ch=c, n_blocks=n)
                for i, (c, n) in enumerate(
                    ((64, 3), (256, 4), (512, 6), (1024, 3)), start=1)]
    stage_vars = [subtree(pre, (f"layer{i}_",)) for i in range(1, 5)]
    acts = [f0]
    for m, v in zip(stage_ms[:3], stage_vars[:3]):
        acts.append(jax.jit(lambda a, m=m, v=v: m.apply(v, a))(acts[-1]))

    bn1 = pre["params"]["bn1"]
    bs1 = pre["batch_stats"]["bn1"]
    s2d_args = (pre["params"]["conv1"]["kernel"],
                (bn1["scale"], bn1["bias"], bs1["mean"], bs1["var"]))

    def cast(tree, dt):
        return jax.tree.map(
            lambda v: v.astype(dt) if v.dtype == jnp.float32 else v, tree)

    rows = []
    for dtype, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        vv = cast(variables, dtype)
        hv = cast(head_vars, dtype)
        sv = cast(stem_vars, dtype)
        s2d = stem_s2d_fn(*jax.tree.map(lambda v: v.astype(dtype), s2d_args))
        stages = {
            "full": (lambda a, v=vv: model.apply(v, a), x),
            "backbone": (lambda a, v=vv: model.apply(
                v, a, method="backbone"), x),
            "stem": (lambda a: stem_m.apply(sv, a), x),
            "stem_s2d": (s2d, x),
            "head_subpixel": (lambda a, v=hv: Head(subpixel=True).apply(
                v, a), feat),
            "head_dilated": (lambda a, v=hv: Head(subpixel=False).apply(
                v, a), feat),
        }
        for i in range(4):
            stages[f"layer{i + 1}"] = (
                lambda a, m=stage_ms[i], v=cast(stage_vars[i], dtype):
                m.apply(v, a), acts[i])
        for stage, (fn, inp) in stages.items():
            inp = inp.astype(dtype)
            dt = chain_time(fn, inp)
            fl = flops_of(fn, inp)
            rows.append({
                "stage": stage, "dtype": name,
                "ms_per_batch": round(dt * 1e3, 2),
                "samples_per_s": round(BATCH / dt, 1),
                "gflops_per_batch": round(fl / 1e9, 1),
                "mfu_vs_bf16_peak": round(fl / dt / V5E_BF16_PEAK, 3)
                if fl else None,
            })
            print(json.dumps(rows[-1]), flush=True)

    # exactness of the s2d stem rewrite vs the direct conv (small slice)
    s2d32 = stem_s2d_fn(*s2d_args)
    a = stem_m.apply(stem_vars, x[:4])
    b = s2d32(x[:4])
    err = float(jnp.max(jnp.abs(a - b)))
    print(json.dumps({"s2d_stem_max_abs_err_f32": err}), flush=True)

    if SMOKE:
        return
    with open("exp/FORWARD_PROFILE.md", "w") as f:
        f.write("# SimplePose-R50 @256x192 per-stage forward profile "
                f"(batch {BATCH}, v5e via axon tunnel)\n\n"
                "Methodology: chained-fori wall (bench.py), XLA "
                "cost-analysis FLOPs; MFU vs 197 Tf/s v5e MXU peak (f32 "
                "convs at default precision execute as bf16 multiplies "
                "with f32 accumulation on the MXU, so one peak serves "
                "both dtypes; the f32 rows pay their extra cost in HBM "
                "bytes, not FLOPs).\n\n```\n")
        for r in rows:
            f.write(json.dumps(r) + "\n")
        f.write(json.dumps({"s2d_stem_max_abs_err_f32": err}) + "\n")
        f.write("```\n")


if __name__ == "__main__":
    main()
