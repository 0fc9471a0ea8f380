"""Multi-device tests on the 8-device virtual CPU mesh (conftest.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


class TestMesh:
    def test_eight_virtual_devices(self):
        assert len(jax.devices()) == 8

    def test_dryrun_multichip_full_train_step(self):
        import __graft_entry__ as ge
        ge.dryrun_multichip(8)

    def test_entry_traces(self):
        # full compile of the ResNet-50 entry is exercised by the driver;
        # here we check it traces/lowers (cheap on 1 CPU core).
        import __graft_entry__ as ge
        fn, args = ge.entry()
        out = jax.eval_shape(fn, *args)
        assert out[0].shape == (8, 17, 64, 48)
        assert jax.jit(fn).lower(*args) is not None

    def test_sharded_eval_step_matches_single_device(self):
        from vatl4pose_tpu.models import SimplePose
        from vatl4pose_tpu.parallel.mesh import make_mesh, shard_batch
        from vatl4pose_tpu.parallel.steps import build_sharded_eval_step
        model = SimplePose(num_joints=17, num_layers=18, train=False)
        x = jnp.asarray(np.random.default_rng(0).normal(
            0, 1, (8, 64, 64, 3)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x[:1])
        mesh = make_mesh(8)
        step = build_sharded_eval_step(model, mesh)
        with mesh:
            hm_sharded, emb = step(variables, shard_batch(x, mesh))
        hm_single = jnp.transpose(model.apply(variables, x), (0, 3, 1, 2))
        np.testing.assert_allclose(np.asarray(hm_sharded),
                                   np.asarray(hm_single), rtol=2e-4,
                                   atol=1e-5)

    def test_sharded_train_step_runs(self):
        from vatl4pose_tpu.models import SimplePose
        from vatl4pose_tpu.parallel.mesh import make_mesh
        from vatl4pose_tpu.parallel.steps import build_sharded_train_step
        from vatl4pose_tpu.train.optim import init_state, make_adamw
        from jax.sharding import NamedSharding, PartitionSpec as P
        model = SimplePose(num_joints=17, num_layers=18, train=True)
        B = 8
        x = jnp.asarray(np.random.default_rng(1).normal(
            0, 1, (B, 64, 64, 3)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x[:1])
        target = jnp.zeros((B, 17, 16, 16))
        tw = jnp.ones((B, 17))
        valid = jnp.ones((B,), bool)
        mesh = make_mesh(8)
        upd = make_adamw(0.7)
        step = build_sharded_train_step(model, upd,
                                        lambda k: 1.0, mesh)
        opt_state = init_state(variables["params"])
        bsh = NamedSharding(mesh, P("data"))
        with mesh:
            new_vars, new_opt, loss = step(
                variables, opt_state, jax.device_put(x, bsh),
                jax.device_put(target, bsh), jax.device_put(tw, bsh),
                jax.device_put(valid, bsh), jnp.asarray(1e-3))
        assert np.isfinite(float(loss))
        # params actually changed
        p0 = jax.tree.leaves(variables["params"])[0]
        p1 = jax.tree.leaves(new_vars["params"])[0]
        assert not np.allclose(np.asarray(p0), np.asarray(p1))


class TestTwoAxisMesh:
    def test_video_by_data_mesh(self):
        """The embarrassingly-parallel per-video axis the reference drives
        from a shell loop (backrun_active_learning.sh) becomes a second mesh
        dimension: videos shard over 'video', each video's samples shard
        over 'data' (SURVEY §2.5 / §5.8)."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        from vatl4pose_tpu.models import SimplePose
        from vatl4pose_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(8, axes=("video", "data"), shape=(2, 4))
        model = SimplePose(num_joints=17, num_layers=18, train=False)
        x = jnp.asarray(np.random.default_rng(3).normal(
            0, 1, (2, 8, 64, 64, 3)), jnp.float32)   # (videos, samples, ...)
        variables = model.init(jax.random.PRNGKey(0), x[0, :1])
        vs = NamedSharding(mesh, P("video", "data"))
        repl = NamedSharding(mesh, P())

        def fwd(variables, x):
            V, B = x.shape[0], x.shape[1]
            hm = model.apply(variables, x.reshape(V * B, *x.shape[2:]))
            return hm.reshape(V, B, *hm.shape[1:])

        step = jax.jit(fwd, in_shardings=(repl, vs), out_shardings=vs)
        with mesh:
            out = step(jax.device_put(variables, repl),
                       jax.device_put(x, vs))
        assert out.shape == (2, 8, 16, 16, 17)
        # matches the unsharded forward
        ref = model.apply(variables, x.reshape(16, 64, 64, 3))
        np.testing.assert_allclose(
            np.asarray(out).reshape(16, 16, 16, 17), np.asarray(ref),
            rtol=2e-4, atol=1e-5)
