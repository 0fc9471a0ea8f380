"""Training-stack parity: optimizers vs torch.optim (exact sequences),
losses, accuracy metric, schedules."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from vatl4pose_tpu.train import optim as O

RNG = np.random.default_rng(99)


def run_torch_opt(make_opt, params_np, grads_seq):
    tp = [torch.nn.Parameter(torch.tensor(p)) for p in params_np]
    opt = make_opt(tp)
    for grads in grads_seq:
        opt.zero_grad()
        for p, g in zip(tp, grads):
            p.grad = torch.tensor(g)
        opt.step()
    return [p.detach().numpy() for p in tp]


def run_ours(update, params_np, grads_seq, lr, lr_mults=None):
    params = {f"p{i}": jnp.asarray(p) for i, p in enumerate(params_np)}
    state = O.init_state(params)
    mults = None
    if lr_mults:
        mults = {f"p{i}": m for i, m in enumerate(lr_mults)}
    for grads in grads_seq:
        g = {f"p{i}": jnp.asarray(gg) for i, gg in enumerate(grads)}
        params, state = update(params, g, state, jnp.asarray(lr), mults)
    return [np.asarray(params[f"p{i}"]) for i in range(len(params_np))]


def make_case(n_steps=5):
    params = [RNG.normal(0, 1, (4, 3)).astype(np.float32),
              RNG.normal(0, 1, (7,)).astype(np.float32)]
    grads_seq = [[RNG.normal(0, 0.5, p.shape).astype(np.float32)
                  for p in params] for _ in range(n_steps)]
    return params, grads_seq


class TestOptimizers:
    def test_adamw_matches_torch(self):
        params, grads = make_case()
        golden = run_torch_opt(
            lambda tp: torch.optim.AdamW(tp, lr=2.5e-4, weight_decay=0.7),
            params, grads)
        got = run_ours(O.make_adamw(weight_decay=0.7), params, grads, 2.5e-4)
        for a, b in zip(got, golden):
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)

    def test_adamw_per_group_lr(self):
        params, grads = make_case()
        golden = run_torch_opt(
            lambda tp: torch.optim.AdamW(
                [{"params": [tp[0]], "lr": 2.5e-3},
                 {"params": [tp[1]], "lr": 2.5e-4}], weight_decay=0.7),
            params, grads)
        got = run_ours(O.make_adamw(weight_decay=0.7), params, grads,
                       2.5e-4, lr_mults=[10.0, 1.0])
        for a, b in zip(got, golden):
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)

    def test_adam_matches_torch(self):
        params, grads = make_case()
        golden = run_torch_opt(lambda tp: torch.optim.Adam(tp, lr=1e-3),
                               params, grads)
        got = run_ours(O.make_adam(), params, grads, 1e-3)
        for a, b in zip(got, golden):
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)

    def test_sgd_momentum_matches_torch(self):
        params, grads = make_case()
        golden = run_torch_opt(
            lambda tp: torch.optim.SGD(tp, lr=0.01, momentum=0.9,
                                       weight_decay=0.0005),
            params, grads)
        got = run_ours(O.make_sgd(momentum=0.9, weight_decay=0.0005),
                       params, grads, 0.01)
        for a, b in zip(got, golden):
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)


class TestSchedules:
    def test_exponential(self):
        lr = O.exponential_lr(2.5e-4, 0.99)
        assert abs(lr(0) - 2.5e-4) < 1e-12
        assert abs(lr(10) - 2.5e-4 * 0.99 ** 10) < 1e-12

    def test_multistep(self):
        lr = O.multistep_lr(1e-3, [90, 120], 0.1)
        assert lr(0) == 1e-3
        assert abs(lr(90) - 1e-4) < 1e-12
        assert abs(lr(120) - 1e-5) < 1e-15
        assert abs(lr(200) - 1e-5) < 1e-15

    def test_warmup(self):
        lr = O.with_warmup(O.multistep_lr(1e-3, [90], 0.1), 10)
        assert abs(lr(0) - 1e-4) < 1e-15         # (0+1)/10 of base
        assert abs(lr(4) - 5e-4) < 1e-15
        assert lr(9) == 1e-3                     # warmup complete
        assert lr(50) == 1e-3                    # no effect after warmup
        assert abs(lr(90) - 1e-4) < 1e-12        # milestones still apply
        base = O.multistep_lr(1e-3, [90], 0.1)
        assert O.with_warmup(base, 0) is base    # disabled => untouched


class TestLosses:
    def test_masked_mse_matches_torch_call_site(self):
        from vatl4pose_tpu.models.criterion import masked_heatmap_loss
        out = RNG.normal(0, 1, (4, 17, 8, 6)).astype(np.float32)
        tgt = RNG.normal(0, 1, (4, 17, 8, 6)).astype(np.float32)
        mask = (RNG.uniform(size=(4, 17, 1, 1)) > 0.3).astype(np.float32)
        golden = 0.5 * torch.nn.MSELoss()(
            torch.tensor(out) * torch.tensor(mask),
            torch.tensor(tgt) * torch.tensor(mask)).item()
        got = float(masked_heatmap_loss(jnp.asarray(out), jnp.asarray(tgt),
                                        jnp.asarray(mask)))
        np.testing.assert_allclose(got, golden, rtol=1e-6)

    def test_padded_batch_matches_unpadded(self):
        from vatl4pose_tpu.models.criterion import masked_heatmap_loss
        out = RNG.normal(0, 1, (3, 17, 8, 6)).astype(np.float32)
        tgt = RNG.normal(0, 1, (3, 17, 8, 6)).astype(np.float32)
        mask = np.ones((3, 17, 1, 1), np.float32)
        base = float(masked_heatmap_loss(jnp.asarray(out), jnp.asarray(tgt),
                                         jnp.asarray(mask)))
        pad = lambda a: np.concatenate([a, np.zeros_like(a)[:2]])
        valid = jnp.asarray([True, True, True, False, False])
        padded = float(masked_heatmap_loss(
            jnp.asarray(pad(out)), jnp.asarray(pad(tgt)),
            jnp.asarray(pad(mask)), valid=valid))
        np.testing.assert_allclose(padded, base, rtol=1e-6)


class TestAccuracy:
    def test_calc_accuracy_matches_reference_semantics(self):
        from vatl4pose_tpu.utils.metrics import calc_accuracy
        from vatl4pose_tpu.ops.heatmap import get_max_pred

        preds = RNG.normal(0.2, 0.5, (6, 17, 16, 12)).astype(np.float32)
        labels = RNG.normal(0.2, 0.5, (6, 17, 16, 12)).astype(np.float32)

        # numpy replica of metrics.py:118-147
        def ref_acc(preds, labels, thr=0.5):
            p = np.asarray(get_max_pred(jnp.asarray(preds))[0])
            l = np.asarray(get_max_pred(jnp.asarray(labels))[0])
            H, W = preds.shape[2], preds.shape[3]
            norm = np.array([W, H]) / 10
            dists = np.zeros((17, 6))
            for n in range(6):
                for c in range(17):
                    if l[n, c, 0] > 1 and l[n, c, 1] > 1:
                        dists[c, n] = np.linalg.norm(
                            p[n, c] / norm - l[n, c] / norm)
                    else:
                        dists[c, n] = 0
            accs = []
            for c in range(17):
                cal = dists[c] != 0
                if cal.sum() > 0:
                    accs.append((dists[c][cal] < thr).sum() / cal.sum())
            return float(np.mean(accs)) if accs else 0.0

        np.testing.assert_allclose(calc_accuracy(preds, labels),
                                   ref_acc(preds, labels), rtol=1e-6)


class TestAETrainerScan:
    def test_scan_matches_per_step_loop(self):
        """The AE_CHUNK-fused scan (incl. no-op padding of the last chunk)
        must produce exactly the same weights as stepping the jitted
        per-step program with the same shuffled batches."""
        from vatl4pose_tpu.models import build_wholebody_ae
        from vatl4pose_tpu.train.retrain import AETrainer
        from vatl4pose_tpu.data.pipeline import pad_to

        cfg = {"Z_DIM": 4}
        model = build_wholebody_ae(cfg)
        feats = RNG.normal(0, 0.3, (37, 38)).astype(np.float32)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 38)))

        t = AETrainer(model, lr=1e-3, epochs=2, batch_size=10, seed=318)
        got = t.train(variables, feats)

        # reference: identical batch schedule through the per-step program
        ref = AETrainer(model, lr=1e-3, epochs=2, batch_size=10, seed=318)
        vars_r = variables
        opt_state = O.init_state(vars_r["params"])
        for _ in range(2):
            order = ref.rng.permutation(len(feats))
            for s in range(0, len(feats), 10):
                sel = order[s:s + 10]
                fb = pad_to(feats[sel], 10)
                valid = np.zeros(10, np.float32)
                valid[:len(sel)] = 1.0
                vars_r, opt_state, _ = ref._step(
                    vars_r, opt_state, jnp.asarray(fb), jnp.asarray(valid),
                    jnp.asarray(1e-3, jnp.float32))
        for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(vars_r)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-6)


class TestRetrainScanEquivalence:
    def test_scan_chunks_match_per_step_loop(self, tmp_path):
        """retrain() (16-step lax.scan chunks with no-op padding) must
        produce the same weights/loss as driving the per-step jitted
        program with the identical rng stream and batch schedule."""
        import jax
        import jax.numpy as jnp
        from vatl4pose_tpu.config import Cfg
        from vatl4pose_tpu.data.dataset import build_dataset
        from vatl4pose_tpu.data.pipeline import AugCfg, train_sample_geometry
        from vatl4pose_tpu.data.synthetic import make_synthetic_video
        from vatl4pose_tpu.models import build_sppe
        from vatl4pose_tpu.train.retrain import Retrainer

        root, ann = make_synthetic_video(str(tmp_path), num_frames=4,
                                         num_persons=2, width=160,
                                         height=128)
        ds = build_dataset(Cfg({"TYPE": "Posetrack21", "ROOT": root,
                                "ANN": ann, "IMG_PREFIX": ""}))
        preset = Cfg({"IMAGE_SIZE": [64, 64], "HEATMAP_SIZE": [16, 16],
                      "SIGMA": 2, "NUM_JOINTS": 17, "TYPE": "simple"})
        mcfg = Cfg({"TYPE": "SimplePose", "NUM_DECONV_FILTERS": [64, 64, 64],
                    "NUM_LAYERS": 18})
        model_t = build_sppe(mcfg, preset, train=True)
        variables = model_t.init(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 64, 64, 3)))
        rcfg = {"OPTIMIZER": "AdamW", "LR": 2.5e-4, "LR_GAMMA": 0.99,
                "BATCH_SIZE": 4, "WEIGHT_DECAY": 0.7}
        aug = AugCfg(scale_factor=0.1, rot_factor=20, flip=True)
        frames = jax.device_put(ds.load_frames())
        idx = np.arange(len(ds.data))
        img_wh = (ds.data.width, ds.data.height)

        tr = Retrainer(model_t, rcfg, "SimplePose", input_size=(64, 64),
                       hm_size=(16, 16), aug=aug,
                       joint_pairs=ds.joint_pairs, seed=99)
        opt_state = tr.init_opt_state(variables["params"])
        got_vars, _, got_loss, got_acc = tr.retrain(
            variables, opt_state, ds.data, frames, idx, 3, img_wh)

        # reference: same schedule, per-step program
        ref = Retrainer(model_t, rcfg, "SimplePose", input_size=(64, 64),
                        hm_size=(16, 16), aug=aug,
                        joint_pairs=ds.joint_pairs, seed=99)
        vars_r = variables
        opt_r = ref.init_opt_state(variables["params"])
        d = ds.data
        for _ in range(3):
            lr = ref.base_lr * (ref.gamma ** ref.epoch_counter)
            order = ref.rng.permutation(len(idx))
            for s in range(0, len(order), 4):
                sel_p = np.resize(idx[order[s:s + 4]], 4)
                mats0, _, joints, vis, _ = train_sample_geometry(
                    d.bboxes[sel_p], d.joints_xy[sel_p], d.joints_vis[sel_p],
                    img_wh, (64, 64), ref.aug, ref.joint_pairs, ref.rng)
                mats, phi = ref._warp_mats(mats0)
                vars_r, opt_r, loss, acc = ref._step(
                    vars_r, opt_r, frames, jnp.asarray(d.frame_idx[sel_p]),
                    jnp.asarray(mats), jnp.asarray(phi), jnp.asarray(joints),
                    jnp.asarray(vis), jnp.asarray(np.ones(4, bool)),
                    jnp.asarray(lr, jnp.float32))
            ref.epoch_counter += 1
        # scan-fused vs per-step compilation reorders float accumulations;
        # AdamW's 1/sqrt(v) (v still tiny) and BatchNorm compound the
        # ulp-level differences chaotically over steps, so exact equality
        # is not expected — bound the drift statistically instead.  A real
        # logic bug (padded no-op steps leaking, rng misalignment, step
        # order) shifts entire leaves by >> these bounds.
        for a, b in zip(jax.tree.leaves(got_vars), jax.tree.leaves(vars_r)):
            a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
            close = np.abs(a - b) <= 1e-2 + 5e-2 * np.abs(b)
            assert close.mean() > 0.995, (a.shape, close.mean())
            assert np.abs(a - b).max() < 0.05


class TestRetrainBatchNormSafety:
    def test_tiny_retrain_set_does_not_poison_batch_stats(self, tmp_path):
        """Regression: retraining 2 samples at BATCH_SIZE 32 must not wreck
        eval-mode behavior.  Zero-row padding used to flow into BatchNorm's
        batch statistics (97% zero images -> running stats collapse -> the
        all-zero AP columns in every round-1 exp/ run); cycle-padding keeps
        the batch mean/var identical to the unpadded batch."""
        import jax
        import jax.numpy as jnp
        from vatl4pose_tpu.config import Cfg
        from vatl4pose_tpu.data.dataset import build_dataset
        from vatl4pose_tpu.data.pipeline import AugCfg
        from vatl4pose_tpu.data.synthetic import make_synthetic_video
        from vatl4pose_tpu.models import build_sppe
        from vatl4pose_tpu.train.retrain import Retrainer

        root, ann = make_synthetic_video(str(tmp_path), num_frames=4,
                                         num_persons=2, width=160,
                                         height=128)
        ds = build_dataset(Cfg({"TYPE": "Posetrack21", "ROOT": root,
                                "ANN": ann, "IMG_PREFIX": ""}))
        preset = Cfg({"IMAGE_SIZE": [64, 64], "HEATMAP_SIZE": [16, 16],
                      "SIGMA": 2, "NUM_JOINTS": 17, "TYPE": "simple"})
        mcfg = Cfg({"TYPE": "SimplePose", "NUM_DECONV_FILTERS": [64, 64, 64],
                    "NUM_LAYERS": 18})
        model_t = build_sppe(mcfg, preset, train=True)
        model_e = build_sppe(mcfg, preset, train=False)
        variables = model_t.init(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 64, 64, 3)))
        trainer = Retrainer(model_t, {"OPTIMIZER": "AdamW", "LR": 2.5e-4,
                                      "LR_GAMMA": 0.99, "BATCH_SIZE": 32,
                                      "WEIGHT_DECAY": 0.7},
                            "SimplePose", input_size=(64, 64),
                            hm_size=(16, 16), sigma=2.0,
                            aug=AugCfg(scale_factor=0.0, rot_factor=0,
                                       flip=False), joint_pairs=[])
        opt_state = trainer.init_opt_state(variables["params"])
        frames = jax.device_put(ds.load_frames())
        variables, opt_state, loss, acc = trainer.retrain(
            variables, opt_state, ds.data, frames, np.array([0, 1]), 5,
            (ds.data.width, ds.data.height))
        # eval-mode forward must stay finite and in heatmap range; with
        # zero-padding the running stats collapsed and outputs blew up
        stats = variables["batch_stats"]
        leaves = jax.tree.leaves(stats)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        # batch stats must reflect real-image statistics: the stem conv's
        # running mean must have moved away from init (0) but stay bounded
        from vatl4pose_tpu.al.scoring import ScoringConfig, ScoringEngine
        engine = ScoringEngine(model_e, ScoringConfig(
            uncertainty="None", need_embedding=False, input_size=(64, 64)))
        d = ds.data
        bbox_ann = np.stack([d.bboxes[:, 0], d.bboxes[:, 1],
                             d.bboxes[:, 2] - d.bboxes[:, 0],
                             d.bboxes[:, 3] - d.bboxes[:, 1]], 1)
        res = engine.score(variables, frames, d.frame_idx, d.bboxes,
                           d.gt_keypoints, bbox_ann, d.is_prev, d.is_next,
                           keep_heatmaps=True)
        hm = np.asarray(res["heatmaps"])
        assert np.isfinite(hm).all()
        assert np.abs(hm).max() < 10.0, np.abs(hm).max()


class TestRetrainLearns:
    @pytest.mark.parametrize("bf16", [False, True])
    def test_loss_drops_and_accuracy_rises(self, tmp_path, bf16):
        """Fast learning check on the device retrain path: loss decreases
        and heatmap-argmax accuracy (calc_accuracy) rises over epochs.
        bf16=True exercises the mixed-precision step (bf16 compute, f32
        master weights) — it must also learn, and keep params in f32."""
        import jax
        import jax.numpy as jnp
        from vatl4pose_tpu.config import Cfg
        from vatl4pose_tpu.data.dataset import build_dataset
        from vatl4pose_tpu.data.pipeline import AugCfg
        from vatl4pose_tpu.data.synthetic import make_synthetic_video
        from vatl4pose_tpu.models import build_sppe
        from vatl4pose_tpu.train.retrain import Retrainer

        root, ann = make_synthetic_video(str(tmp_path), num_frames=4,
                                         num_persons=2, width=160,
                                         height=128)
        ds = build_dataset(Cfg({"TYPE": "Posetrack21", "ROOT": root,
                                "ANN": ann, "IMG_PREFIX": ""}))
        preset = Cfg({"IMAGE_SIZE": [64, 64], "HEATMAP_SIZE": [16, 16],
                      "SIGMA": 2, "NUM_JOINTS": 17, "TYPE": "simple"})
        model = build_sppe(Cfg({"TYPE": "SimplePose",
                                "NUM_DECONV_FILTERS": [64, 64, 64],
                                "NUM_LAYERS": 18}), preset, train=True)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)))
        trainer = Retrainer(model, {"OPTIMIZER": "Adam", "LR": 1e-3,
                                    "LR_GAMMA": 1.0, "BATCH_SIZE": 8},
                            "SimplePose", input_size=(64, 64),
                            hm_size=(16, 16), sigma=2.0,
                            aug=AugCfg(scale_factor=0.0, rot_factor=0,
                                       flip=False), joint_pairs=[],
                            bf16=bf16)
        opt_state = trainer.init_opt_state(variables["params"])
        frames = jax.device_put(ds.load_frames())
        idx = np.arange(len(ds.data))
        losses, accs = [], []
        for _ in range(3):
            variables, opt_state, loss, acc = trainer.retrain(
                variables, opt_state, ds.data, frames, idx, 10,
                (ds.data.width, ds.data.height))
            losses.append(loss)
            accs.append(acc)
        assert losses[-1] < losses[0] * 0.8, losses
        assert accs[-1] > accs[0], accs
        assert accs[-1] > 0.1, accs
        # master weights stay f32 regardless of compute precision
        assert all(l.dtype == jnp.float32 for l in
                   jax.tree.leaves(variables["params"]))
