"""Whole-video scoring engine: one batched device pass per AL round.

Replaces the reference's hot loop (ActiveLearning.py:273-429 — three forward
passes per batch plus a serial per-person Python loop of decode/OKS/
uncertainty) with:

  stage 1 (chunked, jitted): device crop → model forward → heatmaps (+2048-d
          embedding from the same backbone pass);
  stage 2 (whole video, jitted): batched decode, OKS, THC/TPC via shifted
          gathers (numerically identical to the reference's extra neighbor
          forwards — see ops/temporal.py), WPU hybrid+AE, HP/MPE/Margin/
          Entropy, local-peak combine weights.

Every sample's heatmap is computed exactly once.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..data.pipeline import bucket_size, pad_to
from ..ops import (bbox_xyxy_to_xywh, compute_entropy, compute_hybrid,
                   compute_margin, compute_mpe, compute_oks, crop_batch,
                   heatmap_to_coord, localpeak_mean, thc_scores, tpc_scores)

UNC_NONE = "None"


@dataclasses.dataclass
class ScoringConfig:
    uncertainty: str = "THC+WPU"        # HP/TPC/THC_L1/THC_L2/THC+WPU/WPU/...
    need_embedding: bool = True
    input_size: Tuple[int, int] = (256, 192)
    eval_joints: Tuple[int, ...] = tuple(range(17))
    hybrid_drop_ears: bool = True
    bf16: bool = False                  # bf16 forward (decode stays f32)

    @property
    def vl4pose(self) -> bool:
        return self.uncertainty == "VL4Pose"


class ScoringEngine:
    """Compiles and runs the two-stage scoring pipeline for one model."""

    def __init__(self, model, cfg: ScoringConfig, ae_model=None,
                 aux_model=None, chunk: int = 512, mesh=None):
        self.model = model
        self.cfg = cfg
        self.ae_model = ae_model
        self.aux_model = aux_model
        self.mesh = mesh
        if mesh is not None:
            # DP serving: shard every per-sample axis over the 'data' mesh
            # axis, replicate params/frames — XLA runs each chunk across
            # all chips (the multi-chip analog of the reference's
            # DataParallel eval loader, ActiveLearning.py:99,233)
            from jax.sharding import NamedSharding, PartitionSpec as P
            n_dev = int(np.prod(list(mesh.shape.values())))
            chunk = max(chunk, n_dev) // n_dev * n_dev
            self._batch_sh = NamedSharding(mesh, P("data"))
            self._repl_sh = NamedSharding(mesh, P())
        self.chunk = chunk
        self._fwd = jax.jit(self._forward_chunk)
        self._fwd_crops = jax.jit(self._forward_chunk_crops)
        self._score = jax.jit(self._score_video)
        self._score_packed = jax.jit(self._score_video_packed)

    def _shard(self, arr):
        """Batch-shard a device input when a mesh is configured."""
        if self.mesh is None:
            return arr
        return jax.device_put(arr, self._batch_sh)

    def _repl(self, tree):
        if self.mesh is None:
            return tree
        return jax.device_put(tree, self._repl_sh)

    # ---- stage 1: heatmaps + embeddings ----------------------------------
    def _forward_chunk(self, variables, frames, frame_idx, bboxes,
                       aux_variables=None):
        # bf16 serving: single-pass MXU warp (the crops feed a bf16 model
        # whose own input quantization is the same magnitude); parity/f32
        # mode keeps the 3-pass default (see ops/warp.py precision note)
        warp_prec = jax.lax.Precision.DEFAULT if self.cfg.bf16 else None
        crops, bbox_crop = crop_batch(frames.astype(jnp.float32), frame_idx,
                                      bboxes, self.cfg.input_size,
                                      precision=warp_prec)
        return self._model_outputs(variables, crops, aux_variables) \
            + (bbox_crop,)

    def _forward_chunk_crops(self, variables, crops_u8, aux_variables=None):
        """Streaming stage 1: host-warped uint8 crops in (frames stay in
        host RAM — the HBM path for JRDB-scale videos and mixed-resolution
        sets)."""
        from ..ops.warp import RGB_MEAN
        crops = crops_u8.astype(jnp.float32) / 255.0 - jnp.asarray(RGB_MEAN)
        return self._model_outputs(variables, crops, aux_variables)

    def _model_outputs(self, variables, crops, aux_variables=None):
        if self.cfg.bf16:
            crops = crops.astype(jnp.bfloat16)
        aux_params = jnp.zeros((crops.shape[0], 1, 2), jnp.float32)
        if self.cfg.vl4pose and self.aux_model is not None:
            # single backbone pass shared by head + auxiliary net
            feat = self.model.apply(variables, crops,
                                    method=type(self.model).backbone)
            hm = self.model.apply(variables, feat,
                                  method=type(self.model).head)
            aux_params = self.aux_model.apply(aux_variables, feat)
            emb = jnp.mean(feat, axis=(1, 2))
        elif self.cfg.need_embedding:
            hm, emb = self.model.apply(variables, crops,
                                       return_embedding=True)
        else:
            hm = self.model.apply(variables, crops)
            emb = jnp.zeros((crops.shape[0], 1), jnp.float32)
        # NHWC -> NKHW in the model's own dtype: under bf16 serving the
        # (N, K, 64, 48) block stays bf16 — half the HBM write here and half
        # the read in every stage-2 consumer, which all upcast to f32 at
        # entry (exact, fused into their first read), so stage-2 arithmetic
        # is bit-identical to materializing f32 here.
        hm = jnp.transpose(hm, (0, 3, 1, 2))
        emb = emb.astype(jnp.float32)
        return hm, emb, aux_params

    def forward_video(self, variables, frames_dev, frame_idx, bboxes,
                      aux_variables=None):
        """Chunked forward over all N samples. Returns device arrays
        (N, K, h, w), (N, E), (N, 4), (N, L, 2)."""
        n = bboxes.shape[0]
        hms, embs, crops_bb, auxs = [], [], [], []
        variables = self._repl(variables)
        frames_dev = self._repl(frames_dev)
        for s in range(0, n, self.chunk):
            e = min(s + self.chunk, n)
            fi = self._shard(jnp.asarray(
                pad_to(np.asarray(frame_idx[s:e]), self.chunk)))
            bb = self._shard(jnp.asarray(
                pad_to(np.asarray(bboxes[s:e]), self.chunk)))
            hm, emb, ap, bc = self._fwd(variables, frames_dev, fi, bb,
                                        aux_variables)
            hms.append(hm[: e - s])
            embs.append(emb[: e - s])
            crops_bb.append(bc[: e - s])
            auxs.append(ap[: e - s])
        return (jnp.concatenate(hms), jnp.concatenate(embs),
                jnp.concatenate(crops_bb), jnp.concatenate(auxs))

    # ---- stage 2: decode + all criteria ----------------------------------
    def _score_video(self, hms, bbox_crop, gt_kpts, bbox_ann_xywh,
                     is_prev, is_next, ae_variables, aux_params):
        cfg = self.cfg
        ej = np.asarray(cfg.eval_joints)
        pred = hms[:, ej]
        coords, scores = heatmap_to_coord(pred, bbox_crop)
        kpts = jnp.concatenate([coords, scores[..., None]], axis=-1)
        kpts_flat = kpts.reshape(kpts.shape[0], -1)
        oks = compute_oks(kpts_flat, gt_kpts, bbox_ann_xywh)
        det_score = jnp.mean(scores, axis=-1) + 1.25 * jnp.max(scores, axis=-1)

        unc = jnp.zeros(hms.shape[0], jnp.float32)
        unc2 = jnp.zeros(hms.shape[0], jnp.float32)
        u = cfg.uncertainty
        if u == "HP":
            unc = -jnp.sum(scores, axis=-1)
        elif u == "TPC":
            unc = tpc_scores(pred, coords, bbox_crop, is_prev, is_next)
        elif "THC" in u:
            norm = "L2" if "L2" in u else "L1"
            unc = thc_scores(pred, is_prev, is_next, norm_type=norm)
            if "WPU" in u:
                unc2 = self._wpu(ae_variables, bbox_crop, kpts_flat)
        elif "WPU" in u:
            unc = self._wpu(ae_variables, bbox_crop, kpts_flat)
        elif u == "VL4Pose":
            from ..ops.vl4pose import vl4pose_scores
            unc = vl4pose_scores(pred, aux_params)
        elif u == "MPE":
            unc = compute_mpe(pred)
        elif u == "Entropy":
            unc = compute_entropy(pred)
        elif u == "Margin":
            unc = compute_margin(pred)
        elif u != UNC_NONE:
            raise ValueError(f"Uncertainty type {u} is not supported")

        gc = localpeak_mean(pred)
        return {"coords": coords, "scores": scores, "kpts": kpts_flat,
                "oks": oks, "det_score": det_score, "unc": unc, "unc2": unc2,
                "gc": gc}

    # one device->host round trip through the tunnel costs ~40 ms; fetching
    # the 8 stage-2 outputs separately dominated the warm score phase, so
    # the jitted program packs them into ONE (b, 6K+5) f32 buffer fetched
    # once and split on the host
    _PACK_KEYS = ("coords", "scores", "kpts", "oks", "det_score", "unc",
                  "unc2", "gc")

    def _score_video_packed(self, *args):
        out = self._score_video(*args)
        b = out["oks"].shape[0]
        return jnp.concatenate(
            [out[k].reshape(b, -1).astype(jnp.float32)
             for k in self._PACK_KEYS], axis=1)

    def _unpack_scores(self, packed: np.ndarray) -> Dict[str, np.ndarray]:
        K = len(self.cfg.eval_joints)
        widths = (2 * K, K, 3 * K, 1, 1, 1, 1, 1)
        res, o = {}, 0
        for k, w in zip(self._PACK_KEYS, widths):
            v = packed[:, o:o + w]
            o += w
            if k == "coords":
                v = v.reshape(-1, K, 2)
            elif k == "scores":
                v = v.reshape(-1, K)
            elif k != "kpts":
                v = v[:, 0]
            res[k] = np.ascontiguousarray(v)
        return res

    def _wpu(self, ae_variables, bbox_crop, kpts_flat):
        """WPU = MSE reconstruction error of the hybrid feature
        (ActiveLearning.py:364-386, 38-d convention)."""
        feat = compute_hybrid(bbox_xyxy_to_xywh(bbox_crop), kpts_flat,
                              drop_ears=self.cfg.hybrid_drop_ears)
        recon = self.ae_model.apply(ae_variables, feat)
        return jnp.mean(jnp.square(recon - feat), axis=-1)

    # ---- public API -------------------------------------------------------
    def score_streaming(self, variables, frame_store, frame_idx, bboxes,
                        gt_kpts, bbox_ann_xywh, is_prev, is_next,
                        ae_variables=None, aux_variables=None,
                        keep_heatmaps: bool = False, warp_mode: int = 1
                        ) -> Dict[str, np.ndarray]:
        """HBM-bounded scoring: frames stay in host RAM (data/stream
        .FrameStore), stage 1 consumes host-warped crops chunk by chunk, and
        stage 2 runs per chunk with a ±1-row halo — THC/TPC neighbors are a
        shifted gather along the track-sorted axis (ops/temporal.py), so one
        halo row on each side reproduces the whole-video result exactly.
        Device memory is O(chunk), independent of video length — the path
        for JRDB stitched scenes (SURVEY §2.2, jrdb2022.py:13-236).
        """
        from ..data.pipeline import eval_sample_geometry
        from ..data.stream import warp_crops_host

        cfg = self.cfg
        n = int(np.asarray(bboxes).shape[0])
        c = self.chunk
        inv_mats, bbox_crop, fwd_mats = eval_sample_geometry(
            np.asarray(bboxes), cfg.input_size, want_fwd=True)
        frame_idx = np.asarray(frame_idx)
        is_prev = np.asarray(is_prev)
        is_next = np.asarray(is_next)
        bb_ann = np.asarray(bbox_ann_xywh, np.float32)
        gt = np.asarray(gt_kpts, np.float32)
        ae_vars = ae_variables if ae_variables is not None else {"params": {}}

        def halo_host(a, s, e, pad_value=0.0):
            """(e-s, ...) chunk rows → (c+2, ...): one prepended halo slot,
            then the chunk, padded out — row j ↔ sample s+j-1."""
            a = np.asarray(a)
            out = np.full((c + 2,) + a.shape[1:], pad_value, a.dtype)
            out[1:1 + (e - s)] = a
            return out

        out_host: Dict[str, list] = {}
        embs, hms_kept = [], []
        # stage-1/stage-2 software pipeline with a one-chunk delay: chunk i
        # is scored once chunk i+1's first row (its next-halo heatmap)
        # exists; only two chunks of heatmaps are ever live on device.
        pending = None        # (s, e, hm_chunk, aux_chunk)
        prev_tail = None      # last heatmap row of the previous chunk

        def run_stage2(s, e, hm_chunk, aux_chunk, next_head):
            nonlocal prev_tail
            tail = prev_tail if prev_tail is not None \
                else jnp.zeros_like(hm_chunk[:1])
            head = next_head if next_head is not None \
                else jnp.zeros_like(hm_chunk[:1])
            halo = jnp.concatenate([tail, hm_chunk, head])
            halo = jnp.pad(halo, ((0, c + 2 - int(halo.shape[0])),
                                  (0, 0), (0, 0), (0, 0)))
            aux_halo = jnp.asarray(halo_host(np.asarray(aux_chunk), s, e))
            packed = self._score_packed(
                halo,
                jnp.asarray(halo_host(bbox_crop[s:e], s, e, pad_value=1.0)),
                jnp.asarray(halo_host(gt[s:e], s, e)),
                jnp.asarray(halo_host(bb_ann[s:e], s, e, pad_value=1.0)),
                jnp.asarray(halo_host(is_prev[s:e], s, e, pad_value=False)),
                jnp.asarray(halo_host(is_next[s:e], s, e, pad_value=False)),
                ae_vars, aux_halo)
            for k, v in self._unpack_scores(np.asarray(packed)).items():
                out_host.setdefault(k, []).append(v[1:1 + (e - s)])
            prev_tail = hm_chunk[-1:]

        for s in range(0, n, c):
            e = min(s + c, n)
            crops = warp_crops_host(frame_store, frame_idx[s:e],
                                    fwd_mats[s:e], cfg.input_size,
                                    mode=warp_mode)
            hm, emb, ap = self._fwd_crops(variables,
                                          jnp.asarray(pad_to(crops, c)),
                                          aux_variables)
            hm, ap = hm[: e - s], ap[: e - s]
            embs.append(np.asarray(emb[: e - s]))
            if keep_heatmaps:
                hms_kept.append(np.asarray(hm))
            if pending is not None:
                run_stage2(*pending, next_head=hm[:1])
            pending = (s, e, hm, ap)
        if pending is not None:
            run_stage2(*pending, next_head=None)

        res = {k: np.concatenate(v)[:n] for k, v in out_host.items()}
        res["embeddings"] = np.concatenate(embs)[:n]
        res["bbox_crop"] = bbox_crop[:n]
        if keep_heatmaps:
            res["heatmaps"] = np.concatenate(hms_kept)[:n]
        return res

    def score(self, variables, frames_dev, frame_idx, bboxes, gt_kpts,
              bbox_ann_xywh, is_prev, is_next, ae_variables=None,
              aux_variables=None,
              keep_heatmaps: bool = True) -> Dict[str, np.ndarray]:
        n = bboxes.shape[0]
        hms, embs, bbox_crop, aux_params = self.forward_video(
            variables, frames_dev, frame_idx, bboxes, aux_variables)
        # pad the whole-video stage to a bucketed static size so the scoring
        # program compiles once per bucket across videos/rounds; padded rows
        # have no neighbors and are sliced away before any bookkeeping.
        b = bucket_size(n)
        pad = b - n
        if pad:
            hms = jnp.pad(hms, ((0, pad), (0, 0), (0, 0), (0, 0)))
            bbox_crop_p = jnp.pad(bbox_crop,
                                  ((0, pad), (0, 0)),
                                  constant_values=1.0)
            aux_params = jnp.pad(aux_params, ((0, pad), (0, 0), (0, 0)))
        else:
            bbox_crop_p = bbox_crop
        bb_ann = np.asarray(bbox_ann_xywh, np.float32)
        if pad:
            # unit boxes for padded rows keep the (discarded) OKS finite
            bb_ann = np.concatenate(
                [bb_ann, np.ones((pad, 4), np.float32)])
        packed = self._score_packed(
            self._shard(hms), self._shard(bbox_crop_p),
            self._shard(jnp.asarray(
                pad_to(np.asarray(gt_kpts, np.float32), b))),
            self._shard(jnp.asarray(bb_ann)),
            self._shard(jnp.asarray(
                pad_to(np.asarray(is_prev), b))),
            self._shard(jnp.asarray(
                pad_to(np.asarray(is_next), b))),
            self._repl(ae_variables
                       if ae_variables is not None
                       else {"params": {}}),
            self._shard(aux_params))
        res = {k: v[:n]
               for k, v in self._unpack_scores(np.asarray(packed)).items()}
        res["embeddings"] = np.asarray(embs)
        res["bbox_crop"] = np.asarray(bbox_crop)
        if keep_heatmaps:
            # only the --vis/--vis_thc paths read these; dropping them frees
            # the (N, K, h, w) block for HBM-tight videos
            res["heatmaps"] = hms[:n]
        return res
