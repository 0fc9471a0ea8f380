"""Streaming data path: host-RAM frame store + prefetched host-side crops.

The whole-video device-resident path (dataset.load_frames → device crops)
is the fast path for one AL video.  This module covers the cases it cannot:

  * combined pre-training annotation files spanning many videos with
    different resolutions (the reference streams these through DataLoader
    workers, scripts/posetrack_train.py:166-167);
  * videos whose frames exceed the HBM budget (JRDB stitched scenes,
    ~3760-px wide, hundreds of frames — jrdb2022.py:13-236).

Design: frames stay in host RAM (lazily decoded, byte-capped LRU); crops
are produced on the host by the native bit-exact warp engine
(native/warp — the TPU-native replacement for the reference's cv2 worker
pool) grouped by frame shape, and a background prefetch thread keeps one
batch in flight while the device trains on the previous one.
"""

from __future__ import annotations

import queue
import threading
from collections import OrderedDict
from typing import Iterable, Optional, Sequence

import numpy as np

from .dataset import decode_frame
from .pipeline import AugCfg, train_sample_geometry

__all__ = ["FrameStore", "CropStreamer"]


class FrameStore:
    """Lazily decoded host-RAM frames with a byte-capped LRU cache."""

    def __init__(self, frame_paths: Sequence[str], frame_sizes: np.ndarray,
                 cache_bytes: int = 2 << 30):
        self.paths = list(frame_paths)
        self.sizes = np.asarray(frame_sizes, np.int64).reshape(-1, 2)
        self.cache_bytes = int(cache_bytes)
        self._cache: "OrderedDict[int, np.ndarray]" = OrderedDict()
        self._cached_bytes = 0
        self._lock = threading.Lock()

    def __len__(self):
        return len(self.paths)

    @property
    def total_bytes(self) -> int:
        """Decoded size of every frame (HBM-budget estimate)."""
        return int((self.sizes[:, 0] * self.sizes[:, 1] * 3).sum())

    def get(self, idx: int) -> np.ndarray:
        with self._lock:
            if idx in self._cache:
                self._cache.move_to_end(idx)
                return self._cache[idx]
        img = np.ascontiguousarray(decode_frame(self.paths[idx]))
        with self._lock:
            self._cache[idx] = img
            self._cached_bytes += img.nbytes
            while self._cached_bytes > self.cache_bytes and len(self._cache) > 1:
                _, old = self._cache.popitem(last=False)
                self._cached_bytes -= old.nbytes
        return img


def warp_crops_host(store: FrameStore, frame_idx: np.ndarray,
                    fwd_mats: np.ndarray, out_hw,
                    mode: int = 1) -> np.ndarray:
    """(N, out_h, out_w, 3) uint8 crops via the native warp engine, grouped
    by frame shape (the engine wants a uniform (F, H, W, C) stack)."""
    from . import native_warp

    frame_idx = np.asarray(frame_idx, np.int64)
    n = len(frame_idx)
    out = np.zeros((n, int(out_hw[0]), int(out_hw[1]), 3), np.uint8)
    shapes = store.sizes[frame_idx]  # (N, 2) w,h
    for wh in np.unique(shapes, axis=0):
        sel = np.where((shapes == wh).all(axis=1))[0]
        uniq, local = np.unique(frame_idx[sel], return_inverse=True)
        stack = np.stack([store.get(int(f)) for f in uniq])
        out[sel] = native_warp.warp_affine_batch(
            stack, local.astype(np.int32), fwd_mats[sel], out_hw, mode=mode)
    return out


class CropStreamer:
    """Prefetched augmented training crops for the streaming train loop.

    Host does geometry + native warp (what the reference's DataLoader
    workers do with cv2); the device step consumes ready uint8 crops.
    """

    def __init__(self, data, store: FrameStore, input_size, aug: AugCfg,
                 joint_pairs, batch_size: int, seed: int = 166,
                 warp_mode: int = 1, prefetch: int = 2):
        self.data = data
        self.store = store
        self.input_size = tuple(input_size)
        self.aug = aug
        self.joint_pairs = joint_pairs
        self.batch_size = int(batch_size)
        self.rng = np.random.default_rng(seed)
        self.warp_mode = warp_mode
        self.prefetch = prefetch
        self.item_wh = data.item_img_wh()

    def _make_batch(self, sel: np.ndarray):
        d = self.data
        _, _, joints, vis, fwd = train_sample_geometry(
            d.bboxes[sel], d.joints_xy[sel], d.joints_vis[sel],
            self.item_wh[sel], self.input_size, self.aug, self.joint_pairs,
            self.rng)
        crops = warp_crops_host(self.store, d.frame_idx[sel], fwd,
                                self.input_size, mode=self.warp_mode)
        return crops, joints, vis, len(sel)

    def epoch(self, indices: Sequence[int], shuffle: bool = True
              ) -> Iterable[tuple]:
        """Yield (crops_u8, joints, vis, n_valid) with background prefetch.

        Geometry RNG draws happen in submission order on the producer
        thread, so a fixed seed reproduces the identical stream.
        """
        indices = np.asarray(indices, np.int64)
        order = self.rng.permutation(len(indices)) if shuffle \
            else np.arange(len(indices))
        batches = [indices[order[s:s + self.batch_size]]
                   for s in range(0, len(order), self.batch_size)]
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        err: list = []

        def produce():
            try:
                for sel in batches:
                    q.put(self._make_batch(sel))
            except BaseException as e:  # surfaced on the consumer side
                err.append(e)
            finally:
                q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                break
            yield item
        t.join()
        if err:
            raise err[0]
