"""Model parity tests: random-weight torch oracles -> converter -> Flax,
forward outputs must match."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests import torch_models as tm
from vatl4pose_tpu.models import (FastPose, PoseHighResolutionNet, SimplePose,
                                  WholeBodyAE, convert_state_dict)
from vatl4pose_tpu.models.hrnet import DEFAULT_STAGES

RNG = np.random.default_rng(318)


def randomize_bn_stats(module, rng):
    for m in module.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.tensor(
                rng.normal(0, 0.3, m.running_mean.shape), dtype=torch.float32))
            m.running_var.copy_(torch.tensor(
                rng.uniform(0.5, 1.5, m.running_var.shape), dtype=torch.float32))


def run_pair(tmodel, fmodel, arch, x_nchw, extra_vars_check=True):
    tmodel.eval()
    with torch.no_grad():
        randomize_bn_stats(tmodel, RNG)
        ref_out = tmodel(torch.tensor(x_nchw)).numpy()
    variables = convert_state_dict(
        {k: v.numpy() for k, v in tmodel.state_dict().items()}, arch)
    variables = jax.tree.map(jnp.asarray, variables)
    x_nhwc = jnp.asarray(x_nchw.transpose(0, 2, 3, 1))
    out = fmodel.apply(variables, x_nhwc)
    out = np.asarray(out).transpose(0, 3, 1, 2)
    if extra_vars_check:
        # every torch tensor must have landed somewhere
        n_torch = len([k for k in tmodel.state_dict()
                       if not k.endswith("num_batches_tracked")])
        n_flax = sum(x.size >= 0 for x in jax.tree.leaves(variables))
        assert n_torch == n_flax, (n_torch, n_flax)
    return ref_out, out


class TestSimplePose:
    @pytest.mark.parametrize("depth", [18, 50])
    def test_forward_matches_torch(self, depth):
        x = RNG.normal(0, 1, size=(2, 3, 64, 48)).astype(np.float32)
        tmodel = tm.SimplePose(depth=depth)
        fmodel = SimplePose(num_joints=17, num_layers=depth, train=False)
        ref_out, out = run_pair(tmodel, fmodel, "SimplePose", x)
        assert out.shape == ref_out.shape
        np.testing.assert_allclose(out, ref_out, rtol=1e-3, atol=1e-4)

    def test_embedding_matches_torch(self):
        x = RNG.normal(0, 1, size=(1, 3, 64, 48)).astype(np.float32)
        tmodel = tm.SimplePose(depth=50).eval()
        randomize_bn_stats(tmodel, RNG)
        with torch.no_grad():
            ref_emb = tmodel.get_embedding(torch.tensor(x)).numpy()
        variables = jax.tree.map(jnp.asarray, convert_state_dict(
            {k: v.numpy() for k, v in tmodel.state_dict().items()},
            "SimplePose"))
        fmodel = SimplePose(num_joints=17, num_layers=50)
        _, emb = fmodel.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                              return_embedding=True)
        assert emb.shape == (1, 2048)
        np.testing.assert_allclose(np.asarray(emb), ref_emb, rtol=1e-3,
                                   atol=1e-4)


class TestFastPose:
    def test_forward_matches_torch(self):
        x = RNG.normal(0, 1, size=(1, 3, 64, 48)).astype(np.float32)
        tmodel = tm.FastPose(depth=50)
        fmodel = FastPose(num_joints=17, num_layers=50, train=False)
        ref_out, out = run_pair(tmodel, fmodel, "FastPose", x)
        assert out.shape == ref_out.shape
        np.testing.assert_allclose(out, ref_out, rtol=1e-3, atol=1e-4)


class TestHRNet:
    def test_forward_matches_torch(self):
        x = RNG.normal(0, 1, size=(1, 3, 128, 96)).astype(np.float32)
        tmodel = tm.HRNet(DEFAULT_STAGES)
        fmodel = PoseHighResolutionNet(num_joints=17, train=False)
        ref_out, out = run_pair(tmodel, fmodel, "PoseHighResolutionNet", x)
        assert out.shape == ref_out.shape
        np.testing.assert_allclose(out, ref_out, rtol=1e-3, atol=1e-4)

    def test_embedding_available(self):
        # capability the reference lacks: HRNet embeddings for selection
        fmodel = PoseHighResolutionNet(num_joints=17)
        x = jnp.zeros((1, 128, 96, 3))
        variables = fmodel.init(jax.random.PRNGKey(0), x)
        _, emb = fmodel.apply(variables, x, return_embedding=True)
        assert emb.shape == (1, 2048)


class TestWholeBodyAE:
    def test_forward_matches_torch(self):
        x = RNG.uniform(-1, 1, size=(5, 38)).astype(np.float32)
        tmodel = tm.WholeBodyAE(z_dim=4, input_dim=38).eval()
        with torch.no_grad():
            ref_out = tmodel(torch.tensor(x)).numpy()
        variables = jax.tree.map(jnp.asarray, convert_state_dict(
            {k: v.numpy() for k, v in tmodel.state_dict().items()},
            "WholeBodyAE"))
        out = WholeBodyAE(z_dim=4, input_dim=38).apply(variables, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), ref_out, rtol=1e-4,
                                   atol=1e-6)


class TestConvTranspose:
    def test_matches_torch_semantics(self):
        from vatl4pose_tpu.models.layers import TorchConvTranspose
        x = RNG.normal(0, 1, size=(2, 8, 6, 4)).astype(np.float32)  # NHWC
        mod = TorchConvTranspose(features=5)
        variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
        out = mod.apply(variables, jnp.asarray(x))
        kern = np.asarray(variables["params"]["kernel"])  # HWIO
        w_torch = torch.tensor(kern.transpose(2, 3, 0, 1))  # I, O, kh, kw
        ref = torch.nn.functional.conv_transpose2d(
            torch.tensor(x.transpose(0, 3, 1, 2)), w_torch, stride=2,
            padding=1).numpy()
        np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                                   rtol=1e-4, atol=1e-5)

    def test_subpixel_equals_dilated(self):
        """The MXU-dense subpixel decomposition is numerically the dilated
        conv (same taps, one dense contraction) across sizes incl. odd."""
        from vatl4pose_tpu.models.layers import TorchConvTranspose
        for h, w, cin, cout in ((8, 6, 4, 5), (7, 5, 3, 2), (1, 1, 2, 2)):
            x = RNG.normal(0, 1, size=(2, h, w, cin)).astype(np.float32)
            sub = TorchConvTranspose(features=cout, subpixel=True)
            dil = TorchConvTranspose(features=cout, subpixel=False)
            variables = sub.init(jax.random.PRNGKey(1), jnp.asarray(x))
            a = sub.apply(variables, jnp.asarray(x))
            b = dil.apply(variables, jnp.asarray(x))
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)


class TestExport:
    def test_roundtrip_torch_flax_torch(self):
        from vatl4pose_tpu.models.convert_torch import export_state_dict
        tmodel = tm.SimplePose(depth=18)
        sd = {k: v.numpy() for k, v in tmodel.state_dict().items()
              if not k.endswith("num_batches_tracked")}
        variables = convert_state_dict(sd, "SimplePose")
        back = export_state_dict(variables, "SimplePose")
        assert set(back) == set(sd)
        for k in sd:
            np.testing.assert_array_equal(back[k], sd[k])
