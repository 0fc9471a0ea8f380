"""Fused ResNet bottleneck chain (kernels/fused_bottleneck.py).

Three layers of checks:
  1. fold_bn reproduces eval-mode nn.BatchNorm exactly.
  2. The Pallas kernel (interpret mode on CPU) matches the plain-XLA
     reference chain, which in turn matches two chained exact Flax
     Bottlenecks — i.e. the folded math is the reference bottleneck
     (alphapose/models/layers/Resnet.py:99-128) with eval BN folded.
  3. The `fused_eval=True` serving path of ResNet/SimplePose produces the
     same outputs AND the same variable tree as the exact graph (so
     checkpoints and the torch converter are path-agnostic).
"""

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from vatl4pose_tpu.kernels.fused_bottleneck import (
    bottleneck_chain_conv, bottleneck_chain_reference, fold_bn,
    fused_bottleneck_chain)
from vatl4pose_tpu.models import resnet as resnet_mod
from vatl4pose_tpu.models.layers import torch_batchnorm
from vatl4pose_tpu.models.resnet import Bottleneck, ResNet

RNG = np.random.default_rng(41)


def _rand_folded(nb, C, P, dtype=jnp.float32):
    """Random folded chain weights shaped like fused_bottleneck_chain wants."""
    w1 = jnp.asarray(RNG.normal(0, 0.1, (nb, C, P)), dtype)
    w2 = jnp.asarray(RNG.normal(0, 0.1, (nb, 3, 3, P, P)), dtype)
    w3 = jnp.asarray(RNG.normal(0, 0.1, (nb, P, C)), dtype)
    s1 = jnp.asarray(RNG.uniform(0.5, 1.5, (nb, P)), jnp.float32)
    b1 = jnp.asarray(RNG.normal(0, 0.2, (nb, P)), jnp.float32)
    s2 = jnp.asarray(RNG.uniform(0.5, 1.5, (nb, P)), jnp.float32)
    b2 = jnp.asarray(RNG.normal(0, 0.2, (nb, P)), jnp.float32)
    s3 = jnp.asarray(RNG.uniform(0.5, 1.5, (nb, C)), jnp.float32)
    b3 = jnp.asarray(RNG.normal(0, 0.2, (nb, C)), jnp.float32)
    return w1, s1, b1, w2, s2, b2, w3, s3, b3


class TestFoldBN:
    def test_matches_eval_batchnorm(self):
        x = jnp.asarray(RNG.normal(0, 1, (3, 4, 4, 16)), jnp.float32)
        bn = torch_batchnorm("bn", use_running_average=True)
        variables = bn.init(jax.random.PRNGKey(0), x)
        variables = jax.tree.map(
            lambda a: jnp.asarray(RNG.normal(0.3, 0.4, a.shape), a.dtype),
            variables)
        # keep var positive
        variables["batch_stats"]["var"] = jnp.abs(
            variables["batch_stats"]["var"]) + 0.25
        ref = bn.apply(variables, x)
        s, b = fold_bn(variables["params"]["scale"],
                       variables["params"]["bias"],
                       variables["batch_stats"]["mean"],
                       variables["batch_stats"]["var"])
        np.testing.assert_allclose(np.asarray(x * s + b), np.asarray(ref),
                                   rtol=2e-6, atol=2e-6)


class TestChainKernel:
    def test_interpret_matches_xla_reference(self):
        N, H, W, C, P, nb = 2, 6, 5, 16, 4, 3
        x = jnp.asarray(RNG.normal(0, 1, (N, H, W, C)), jnp.float32)
        ws = _rand_folded(nb, C, P)
        out = fused_bottleneck_chain(x, *ws, interpret=True)
        ref = bottleneck_chain_reference(x, *ws)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_reference_matches_exact_flax_bottlenecks(self):
        """The folded chain == nb chained exact Bottleneck modules with the
        same conv kernels and (unfolded) BN stats."""
        N, H, W, P, nb = 2, 5, 6, 4, 2
        C = 4 * P
        x = jnp.asarray(RNG.normal(0, 1, (N, H, W, C)), jnp.float32)
        stream = x
        cols = [[] for _ in range(9)]
        for _ in range(nb):
            block = Bottleneck(P, 1, False, False)
            variables = block.init(jax.random.PRNGKey(int(RNG.integers(1e9))),
                                   stream)
            variables = jax.tree.map(
                lambda a: jnp.asarray(RNG.normal(0.1, 0.3, a.shape), a.dtype),
                variables)
            for k in ("bn1", "bn2", "bn3"):
                variables["batch_stats"][k]["var"] = jnp.abs(
                    variables["batch_stats"][k]["var"]) + 0.25
            stream = block.apply(variables, stream)
            p, bs = variables["params"], variables["batch_stats"]
            folds = [fold_bn(p[k]["scale"], p[k]["bias"],
                             bs[k]["mean"], bs[k]["var"])
                     for k in ("bn1", "bn2", "bn3")]
            # chain layout: (w1, s1, b1, w2, s2, b2, w3, s3, b3)
            row = (p["conv1"]["kernel"][0, 0], *folds[0],
                   p["conv2"]["kernel"], *folds[1],
                   p["conv3"]["kernel"][0, 0], *folds[2])
            for i, v in enumerate(row):
                cols[i].append(v)
        ws = [jnp.stack(c) for c in cols]
        chained = bottleneck_chain_reference(x, *ws)
        np.testing.assert_allclose(np.asarray(chained), np.asarray(stream),
                                   rtol=1e-4, atol=1e-4)

    def test_conv_form_matches_reference(self):
        """The fast-compiling conv form (FUSE_IMPL=conv default) is the same
        contraction with the same f32 accumulation as the einsum form."""
        N, H, W, C, P, nb = 2, 6, 5, 16, 4, 3
        x = jnp.asarray(RNG.normal(0, 1, (N, H, W, C)), jnp.float32)
        ws = _rand_folded(nb, C, P)
        out = bottleneck_chain_conv(x, *ws)
        ref = bottleneck_chain_reference(x, *ws)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
        xb = x.astype(jnp.bfloat16)
        wsb = [w.astype(jnp.bfloat16) if w.ndim >= 3 else w for w in ws]
        outb = bottleneck_chain_conv(xb, *wsb)
        refb = bottleneck_chain_reference(xb, *wsb)
        assert outb.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(outb, np.float32),
                                   np.asarray(refb, np.float32),
                                   rtol=0.05, atol=0.05)

    def test_bf16_stream(self):
        N, H, W, C, P, nb = 4, 4, 4, 8, 2, 2
        x = jnp.asarray(RNG.normal(0, 1, (N, H, W, C)), jnp.bfloat16)
        ws = _rand_folded(nb, C, P, jnp.bfloat16)
        out = fused_bottleneck_chain(x, *ws, interpret=True)
        ref = bottleneck_chain_reference(x, *ws)
        assert out.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref, np.float32),
                                   rtol=0.05, atol=0.05)


def _perturbed_resnet_variables(model, x):
    variables = model.init(jax.random.PRNGKey(0), x)
    flat = jax.tree_util.tree_flatten_with_path(variables)
    leaves = []
    for path, leaf in flat[0]:
        noise = jnp.asarray(RNG.normal(0, 0.05, leaf.shape), leaf.dtype)
        name = jax.tree_util.keystr(path)
        if name.endswith("'var']"):
            leaves.append(jnp.abs(leaf + noise) + 0.25)
        else:
            leaves.append(leaf + noise)
    return jax.tree_util.tree_unflatten(flat[1], leaves)


class TestFusedEvalPath:
    def test_resnet50_fused_matches_exact(self):
        x = jnp.asarray(RNG.normal(0, 1, (2, 64, 48, 3)), jnp.float32)
        exact = ResNet(depth=50, train=False)
        fused = ResNet(depth=50, train=False, fused_eval=True)
        variables = _perturbed_resnet_variables(exact, x)
        y_exact = exact.apply(variables, x)
        y_fused = fused.apply(variables, x)
        # perturbed (non-pretrained) weights amplify activations to O(1e3)
        # over 16 chained blocks, so the folded-BN reassociation leaves
        # worst-case ~0.01 abs diff on near-zero relu-boundary elements;
        # atol 0.05 is 5e-5 relative at the output scale
        np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_exact),
                                   rtol=2e-3, atol=0.05)

    def test_variable_trees_identical(self):
        x = jnp.zeros((1, 32, 32, 3), jnp.float32)
        exact = ResNet(depth=50, train=False)
        fused = ResNet(depth=50, train=False, fused_eval=True)
        v_exact = exact.init(jax.random.PRNGKey(3), x)
        v_fused = fused.init(jax.random.PRNGKey(3), x)
        pe = jax.tree_util.tree_structure(v_exact)
        pf = jax.tree_util.tree_structure(v_fused)
        assert pe == pf
        for (ke, le), (kf, lf) in zip(
                jax.tree_util.tree_flatten_with_path(v_exact)[0],
                jax.tree_util.tree_flatten_with_path(v_fused)[0]):
            assert jax.tree_util.keystr(ke) == jax.tree_util.keystr(kf)
            assert le.shape == lf.shape and le.dtype == lf.dtype
            # identical init draw: same param name path -> same RNG fold
            np.testing.assert_array_equal(np.asarray(le), np.asarray(lf))

    def test_weight_limit_grouping(self, monkeypatch):
        """Forcing one-block groups (extra HBM round trips) must not change
        the math."""
        x = jnp.asarray(RNG.normal(0, 1, (1, 64, 48, 3)), jnp.float32)
        model = ResNet(depth=50, train=False, fused_eval=True)
        variables = _perturbed_resnet_variables(model, x)
        y_whole = model.apply(variables, x)
        monkeypatch.setattr(resnet_mod, "_FUSE_WEIGHT_LIMIT", 1)
        y_split = model.apply(variables, x)
        np.testing.assert_allclose(np.asarray(y_split), np.asarray(y_whole),
                                   rtol=1e-5, atol=1e-5)
