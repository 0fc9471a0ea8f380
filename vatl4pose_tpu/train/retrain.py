"""Fine-tuning / training loops (estimator + WPU autoencoder).

Parity: ActiveLearning.py:651-686 (retrain_model — AdamW per-layer LR
groups, 0.5x masked MSE, ExponentialLR stepped per epoch, shuffled batches)
and :905-925 (retrain_AE).  The reference's DataLoader-worker preprocessing
becomes host-side geometry + device warp/target generation; the whole train
step (crop → forward → loss → backward → optimizer) is one jitted program.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..data.pipeline import AugCfg, pad_to, train_sample_geometry
from ..models.criterion import masked_heatmap_loss
from ..ops.heatmap import gaussian_target
from ..ops.warp import RGB_MEAN, warp_affine_bilinear
from ..utils.metrics import _acc_impl
from .optim import build_optimizer, init_state, lr_multiplier_tree


STEP_CHUNK = 16  # train steps fused into one lax.scan program


def _weighted_stats(stats, counts):
    """Collapse per-step device (loss, acc) rows into sample-weighted
    averages with a single device→host transfer (DataLogger semantics,
    metrics.py:14-32, computed at the end instead of per step).  `stats` is
    a list of (2,) or (C, 2) device arrays; `counts` the per-row sample
    counts (0 for padded no-op steps)."""
    if not stats:
        return 0.0, 0.0
    arr = np.asarray(jnp.concatenate(
        [jnp.atleast_2d(s) for s in stats]), np.float64)  # one fetch
    w = np.asarray(counts, np.float64)
    arr = np.where(w[:, None] > 0, arr, 0.0)  # padded rows: any value * 0
    loss_avg, acc_avg = (arr * w[:, None]).sum(0) / w.sum()
    return float(loss_avg), float(acc_avg)


class Retrainer:
    """Estimator fine-tuner over a (sub)set of video samples."""

    def __init__(self, model_train, retrain_cfg, model_type: str,
                 input_size=(256, 192), hm_size=(64, 48), sigma=2.0,
                 aug: Optional[AugCfg] = None, joint_pairs=None,
                 seed: int = 166, bf16: bool = False, mesh=None):
        self.model = model_train
        self.cfg = retrain_cfg
        self.input_size = tuple(input_size)
        self.hm_size = tuple(hm_size)
        self.sigma = float(sigma)
        self.aug = aug or AugCfg()
        self.joint_pairs = joint_pairs or []
        # mixed precision: bf16 params/activations through fwd+bwd, f32
        # master weights + optimizer state + loss (measured 1.74x on the
        # v5e retrain step, 95.5 -> 54.9 ms at batch 120).  Opt-in:
        # RETRAIN.BF16 or --speedup (not reproducible vs parity mode).
        self.bf16 = bool(bf16 or retrain_cfg.get("BF16", False))
        self.update_fn, self.group_of = build_optimizer(retrain_cfg,
                                                        model_type)
        self.base_lr = retrain_cfg["LR"]
        self.gamma = retrain_cfg.get("LR_GAMMA", 1.0)
        self.batch_size = retrain_cfg["BATCH_SIZE"]
        self.epoch_counter = 0  # survives rounds in continual mode
        self.rng = np.random.default_rng(seed)
        self._warmed = False
        # Rotation warp path.  The Pallas shear kernels (kernels/rot_warp)
        # are DISABLED by default after a real-chip A/B (2026-08-21,
        # exp/ROT_KERNEL_HW.md): both v1 and v2 reproduce the gather warp
        # exactly in interpret mode (the only mode the CPU-pinned test
        # suite can run) and for rot==0 samples on hardware, but on the
        # actual v5e the compiled Mosaic path corrupts ROTATED samples
        # (max err 142/255, mean 8-19/255 per rotated crop; direction
        # verified correct — the corruption is band placement, not a roll
        # sign).  Until the kernel is revalidated on hardware, training
        # correctness wins over the 3.4x warp speedup:
        # VATL4POSE_ROT_KERNEL=1 re-enables it explicitly (experimental).
        # Under a DP mesh the SPMD partitioner cannot partition the custom
        # kernel over the sharded batch axis; CPU always uses the gather
        # warp; the kernel additionally needs 16/8-aligned crop sizes
        # (kernels/rot_warp.plan_v2).
        import os as _os
        self.rot_kernel = (_os.environ.get("VATL4POSE_ROT_KERNEL") == "1"
                           and jax.default_backend() != "cpu"
                           and mesh is None
                           and self.input_size[0] % 16 == 0
                           and self.input_size[1] % 8 == 0)
        self.mesh = mesh
        self._step = jax.jit(self._train_step)
        self._step_crops = jax.jit(self._train_step_crops)
        if mesh is None:
            self._steps_scan = jax.jit(self._train_steps_scan)
        else:
            # DP retraining over the 'data' mesh axis: each scan step's
            # batch axis (axis 1 under the leading step axis T) shards
            # across devices; params/opt/frames replicate.  Inside jit XLA
            # inserts the gradient psum and makes the BatchNorm batch
            # reduction global (SyncBatchNorm semantics) — equivalence vs
            # the single-device step is asserted in
            # tests/test_sharding.py::TestRetrainerMesh.
            from jax.sharding import NamedSharding, PartitionSpec as P
            repl = NamedSharding(mesh, P())
            xsh = NamedSharding(mesh, P(None, "data"))
            tsh = NamedSharding(mesh, P(None))
            self._steps_scan = jax.jit(
                self._train_steps_scan,
                in_shardings=(repl, repl, repl, xsh, xsh, xsh, xsh, xsh,
                              xsh, tsh, tsh),
                out_shardings=(repl, repl, repl))

    def reset_schedule(self):
        self.epoch_counter = 0

    def init_opt_state(self, params):
        return init_state(params)

    # ---- jitted step ------------------------------------------------------
    def _warp_mats(self, inv_mats):
        """Host-side warp-parameter prep: (pre_mats, phi) for the rotation
        kernel, or inv_mats passed through for the gather path."""
        if not self.rot_kernel:
            return np.asarray(inv_mats, np.float32), np.zeros(
                len(inv_mats), np.float32)
        from ..kernels.rot_warp import decompose_rotation
        mats2, phi2, iso_err = decompose_rotation(inv_mats, self.input_size)
        if iso_err > 1e-3:   # aspect-corrected boxes are always isotropic
            raise ValueError(f"anisotropic train affine (err {iso_err:.2g})")
        return mats2, phi2

    def _train_step(self, variables, opt_state, frames, frame_idx, mats,
                    phi, joints, vis, valid, lr):
        params = variables["params"]
        rest = {k: v for k, v in variables.items() if k != "params"}
        inp_h, inp_w = self.input_size

        if self.rot_kernel:
            from ..kernels.rot_warp import warp_rotated_traced2
            crops = warp_rotated_traced2(frames.astype(jnp.float32),
                                         frame_idx, mats, phi,
                                         (inp_h, inp_w))
            crops = crops / 255.0 - jnp.asarray(RGB_MEAN)
        else:
            def crop_one(fi, m):
                img = warp_affine_bilinear(frames[fi].astype(jnp.float32), m,
                                           (inp_h, inp_w))
                return img / 255.0 - jnp.asarray(RGB_MEAN)

            crops = jax.vmap(crop_one)(frame_idx, mats)
        return self._fit_crops(params, rest, opt_state, crops, joints, vis,
                               valid, lr)

    def _train_steps_scan(self, variables, opt_state, frames, frame_idx,
                          mats, phi, joints, vis, valid, lr, upd):
        """STEP_CHUNK train steps fused into ONE device program via
        lax.scan (leading axis T = steps).  Dispatching through the
        tunnelled TPU costs tens of ms per op, so the per-step jit spends
        more wall-clock on dispatch+transfers than on compute; scanning a
        fixed-size chunk makes retrain wall-clock track device time.  Padded
        steps (upd=False) leave params/opt_state/batch_stats untouched via
        a select, so any chunk shape is one compile, reused forever."""

        def body(carry, xs):
            vars_c, opt_c = carry
            fi, m, ph, j, v, va, l, u = xs
            new_vars, new_opt, loss, acc = self._train_step(
                vars_c, opt_c, frames, fi, m, ph, j, v, va, l)
            vars_c = jax.tree.map(lambda a, b: jnp.where(u, a, b),
                                  new_vars, vars_c)
            opt_c = jax.tree.map(lambda a, b: jnp.where(u, a, b),
                                 new_opt, opt_c)
            return (vars_c, opt_c), jnp.stack([loss, acc])

        (variables, opt_state), stats = jax.lax.scan(
            body, (variables, opt_state),
            (frame_idx, mats, phi, joints, vis, valid, lr, upd))
        return variables, opt_state, stats

    def prewarm(self, variables, opt_state, data, frames_dev, img_wh,
                block: bool = False):
        """Compile the scan-chunk program BEFORE the first retrain call.

        Dispatches one all-no-op chunk (upd=False masks every state
        update) from a daemon thread so the 20-40s first compile overlaps
        round-0 evaluation/scoring instead of inflating round-0's retrain
        phase (the r2 fullscale run paid 30.1s on round 0 vs 5-10s steady
        — cycle_times.jsonl).  Uses a throwaway rng so the training rng
        stream is untouched; outputs are discarded.
        """
        if self._warmed or frames_dev is None or len(data.frame_idx) == 0:
            return None
        self._warmed = True
        import threading
        bs, C = self.batch_size, STEP_CHUNK
        rng = np.random.default_rng(0)
        sel = np.resize(np.arange(len(data.frame_idx))[:1], bs)
        inv_mats, _, joints, vis, _ = train_sample_geometry(
            data.bboxes[sel], data.joints_xy[sel], data.joints_vis[sel],
            img_wh, self.input_size, self.aug, self.joint_pairs, rng)
        mats, phi = self._warp_mats(inv_mats)
        tile = lambda a: jnp.asarray(  # noqa: E731
            np.tile(np.asarray(a)[None], (C,) + (1,) * np.ndim(a)))
        args = (variables, opt_state, frames_dev,
                tile(data.frame_idx[sel]), tile(mats), tile(phi),
                tile(joints), tile(vis), tile(np.zeros(bs, bool)),
                jnp.zeros(C, jnp.float32), jnp.zeros(C, bool))

        def go():
            try:
                jax.block_until_ready(self._steps_scan(*args))
            except Exception:   # never take down the AL loop from a warmup
                pass

        t = threading.Thread(target=go, daemon=True,
                             name="retrain-prewarm")
        t.start()
        if block:
            t.join()
        return t

    def _train_step_crops(self, variables, opt_state, crops_u8, joints, vis,
                          valid, lr):
        """Streaming variant: host-warped uint8 crops in, one fused
        normalize→forward→loss→update program (data/stream.CropStreamer
        feeds it; the whole-video device-warp path is _train_step)."""
        params = variables["params"]
        rest = {k: v for k, v in variables.items() if k != "params"}
        crops = crops_u8.astype(jnp.float32) / 255.0 - jnp.asarray(RGB_MEAN)
        return self._fit_crops(params, rest, opt_state, crops, joints, vis,
                               valid, lr)

    def _fit_crops(self, params, rest, opt_state, crops, joints, vis, valid,
                   lr):
        target, tw = gaussian_target(joints, vis, self.hm_size, self.sigma)
        mask = tw[:, None, None, :]  # NHWC mask on the K axis

        def loss_fn(p):
            if self.bf16:
                # cast inside the differentiated fn: the cast's vjp returns
                # f32 grads for the f32 master params; batch_stats stay f32
                p = jax.tree.map(
                    lambda a: a.astype(jnp.bfloat16)
                    if a.dtype == jnp.float32 else a, p)
                x = crops.astype(jnp.bfloat16)
            else:
                x = crops
            out, new_state = self.model.apply(
                {"params": p, **rest}, x, mutable=["batch_stats"])
            out = out.astype(jnp.float32)
            # NHWC; loss masked on joint channel, mean over valid rows
            l = masked_heatmap_loss(out, jnp.transpose(target, (0, 2, 3, 1)),
                                    mask, valid=valid)
            return l, (new_state, out)

        (loss, (new_state, out)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        lr_mults = lr_multiplier_tree(params, self.group_of)
        new_params, opt_state = self.update_fn(params, grads, opt_state, lr,
                                               lr_mults)
        new_vars = {"params": new_params, **new_state}
        # PCK accuracy fused into the same program (calc_accuracy would be a
        # second dispatch + a synchronous scalar fetch per step; through the
        # tunnelled TPU each sync costs ~100ms — more than the 55-95ms step)
        out_nkhw = jnp.transpose(out, (0, 3, 1, 2))
        acc = _acc_impl(out_nkhw, target * tw[:, :, None, None],
                        jnp.float32(0.5))
        return new_vars, opt_state, loss, acc

    # ---- epoch loop -------------------------------------------------------
    def retrain(self, variables, opt_state, data, frames_dev, indices,
                num_epochs: int, img_wh, log=None):
        """Run `num_epochs` over the samples `indices` of `data`
        (VideoPoseData).  Returns (variables, opt_state)."""
        indices = np.asarray(indices, np.int64)
        bs = self.batch_size
        # Precompute EVERY step's geometry on the host (same rng stream and
        # order as a per-step loop), then fuse steps into STEP_CHUNK-sized
        # lax.scan programs — retrain wall-clock tracks device time instead
        # of per-step dispatch/transfer latency through the TPU tunnel.
        steps = []  # (frame_idx, inv_mats, joints, vis, valid, lr, n)
        for _ in range(num_epochs):
            lr = self.base_lr * (self.gamma ** self.epoch_counter)
            order = self.rng.permutation(len(indices))
            for s in range(0, len(order), bs):
                sel = indices[order[s:s + bs]]
                n = len(sel)
                # pad the batch to the static size by CYCLING the real
                # samples, not with zero rows: BatchNorm reduces over the
                # whole batch axis, and zero-image padding poisons the
                # batch statistics (with equal replication the batch
                # mean/var are identical to the unpadded batch's).  The
                # valid mask still keeps padding out of the loss.
                sel_p = np.resize(sel, bs)
                inv_mats, flips, joints, vis, _ = train_sample_geometry(
                    data.bboxes[sel_p], data.joints_xy[sel_p],
                    data.joints_vis[sel_p], img_wh, self.input_size,
                    self.aug, self.joint_pairs, self.rng)
                mats, phi = self._warp_mats(inv_mats)
                valid = np.zeros(bs, bool)
                valid[:n] = True
                steps.append((data.frame_idx[sel_p], mats, phi, joints, vis,
                              valid, lr, n))
            self.epoch_counter += 1  # scheduler.step()
        stats, counts = [], []
        C = STEP_CHUNK
        for s in range(0, len(steps), C):
            chunk = steps[s:s + C]
            t = len(chunk)
            # pad the chunk with no-op replicas of its first step
            # (upd=False masks every state update; n=0 masks the stats)
            chunk = chunk + [chunk[0]] * (C - t)
            upd = np.zeros(C, bool)
            upd[:t] = True
            fi, mats, phis, joints, vis, valid, lrs, ns = zip(*chunk)
            variables, opt_state, st = self._steps_scan(
                variables, opt_state, frames_dev,
                jnp.asarray(np.stack(fi)),
                jnp.asarray(np.stack(mats)),
                jnp.asarray(np.stack(phis)),
                jnp.asarray(np.stack(joints)),
                jnp.asarray(np.stack(vis)),
                jnp.asarray(np.stack(valid)),
                jnp.asarray(np.asarray(lrs), jnp.float32),
                jnp.asarray(upd))
            stats.append(st)
            counts.extend([n if u else 0 for n, u in zip(ns, upd)])
        # accuracy over the cycled batch double-counts replicas of the real
        # rows — an unbiased average, shape kept static
        loss_avg, acc_avg = _weighted_stats(stats, counts)
        if log:
            log(f"loss: {loss_avg:.7f} | acc: {acc_avg:.4f}")
        return variables, opt_state, loss_avg, acc_avg

    def retrain_streaming(self, variables, opt_state, streamer, indices,
                          num_epochs: int, log=None):
        """Streaming epoch loop: host-prefetched native-warp crops
        (data/stream.CropStreamer) feed the fused device step — the path
        for mixed-resolution pre-training sets and videos past the HBM
        budget (the reference's DataLoader-worker role,
        posetrack_train.py:166-167)."""
        bs = self.batch_size
        stats, counts = [], []
        for _ in range(num_epochs):
            lr = self.base_lr * (self.gamma ** self.epoch_counter)
            for crops, joints, vis, n in streamer.epoch(indices):
                valid = np.zeros(bs, bool)
                valid[:n] = True
                # cycle-pad (not zero-pad): see retrain() — zero rows
                # poison the BatchNorm batch statistics
                crops = np.resize(crops, (bs,) + crops.shape[1:])
                joints = np.resize(joints, (bs,) + joints.shape[1:])
                vis = np.resize(vis, (bs,) + vis.shape[1:])
                variables, opt_state, loss, acc = self._step_crops(
                    variables, opt_state, jnp.asarray(crops),
                    jnp.asarray(joints),
                    jnp.asarray(vis), jnp.asarray(valid),
                    jnp.asarray(lr, jnp.float32))
                stats.append(jnp.stack([loss, acc]))
                counts.append(n)
            self.epoch_counter += 1
        loss_avg, acc_avg = _weighted_stats(stats, counts)
        if log:
            log(f"loss: {loss_avg:.7f} | acc: {acc_avg:.4f}")
        return variables, opt_state, loss_avg, acc_avg


class AETrainer:
    """WPU autoencoder fine-tuning (ActiveLearning.py:905-925): Adam,
    MSE, fixed epochs, batch 10."""

    AE_CHUNK = 64  # steps fused into one lax.scan program

    def __init__(self, ae_model, lr: float, epochs: int, batch_size: int = 10,
                 seed: int = 318):
        from .optim import make_adam
        self.model = ae_model
        self.lr = lr
        self.epochs = epochs
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)
        self.update_fn = make_adam()
        self._step = jax.jit(self._train_step)
        self._steps_scan = jax.jit(self._train_steps_scan)

    def _train_step(self, variables, opt_state, feats, valid, lr):
        def loss_fn(p):
            out = self.model.apply({"params": p}, feats)
            sq = jnp.mean(jnp.square(out - feats), axis=-1)
            return jnp.sum(sq * valid) / jnp.maximum(jnp.sum(valid), 1)

        loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
        new_params, opt_state = self.update_fn(variables["params"], grads,
                                               opt_state, lr)
        return {"params": new_params}, opt_state, loss

    def _train_steps_scan(self, variables, opt_state, feats, valid, lr, upd):
        """AE_CHUNK steps fused into one device program (same rationale as
        Retrainer._train_steps_scan: per-step dispatch through the TPU
        tunnel costs ~100ms while the 4-layer-MLP step itself is ~µs, so
        the whole per-round AE fine-tune collapses to one-or-two
        dispatches).  Padded steps (upd=False) are no-ops via a select."""

        def body(carry, xs):
            vars_c, opt_c = carry
            f, v, u = xs
            new_vars, new_opt, _ = self._train_step(vars_c, opt_c, f, v, lr)
            vars_c = jax.tree.map(lambda a, b: jnp.where(u, a, b),
                                  new_vars, vars_c)
            opt_c = jax.tree.map(lambda a, b: jnp.where(u, a, b),
                                 new_opt, opt_c)
            return (vars_c, opt_c), None

        (variables, opt_state), _ = jax.lax.scan(
            body, (variables, opt_state), (feats, valid, upd))
        return variables, opt_state

    def train(self, variables, features: np.ndarray):
        opt_state = init_state(variables["params"])
        n = len(features)
        bs = self.batch_size
        steps = []
        for _ in range(self.epochs):
            order = self.rng.permutation(n)
            for s in range(0, n, bs):
                sel = order[s:s + bs]
                feats = pad_to(features[sel], bs)
                valid = np.zeros(bs, np.float32)
                valid[:len(sel)] = 1.0
                steps.append((feats, valid))
        C = self.AE_CHUNK
        for s in range(0, len(steps), C):
            chunk = steps[s:s + C]
            t = len(chunk)
            chunk = chunk + [chunk[0]] * (C - t)
            upd = np.zeros(C, bool)
            upd[:t] = True
            f, v = zip(*chunk)
            variables, opt_state = self._steps_scan(
                variables, opt_state, jnp.asarray(np.stack(f)),
                jnp.asarray(np.stack(v)), jnp.asarray(self.lr, jnp.float32),
                jnp.asarray(upd))
        return variables
