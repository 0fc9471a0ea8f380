"""Pallas TPU kernel: fused heatmap post-processing.

One VMEM pass per sample over its (K, H, W) heatmaps produces everything the
scoring stage needs from raw heatmaps:

  * per-joint argmax coords + maxvals (transforms.py:710-727),
  * the ±0.25 subpixel shift inputs (the 4 neighbor values at the peak),
  * the local-peak combine-weight statistics (sum + count of kept 3x3 peaks,
    local_peak.py:5-22).

The XLA version reads the heatmap array from HBM several times (argmax,
gathers, max-filter); this kernel reads each heatmap tile into VMEM once and
emits one (8, 128) result tile per sample — the scoring stage becomes pure
HBM-bandwidth-bound at 1 read of the heatmaps.  (Mosaic requires output
blocks tiled to (8, 128), hence the packed layout.)

Grid: one program per sample; block = that sample's (K, H, W) heatmaps
(17*64*48 f32 ≈ 208 KB — comfortably in VMEM).  Row layout of the packed
tile: 0 px, 1 py, 2 maxval, 3 left, 4 right, 5 up, 6 down (first K lanes),
7 = [peak_sum, peak_count].

`fused_postprocess` reproduces ops.heatmap.get_max_pred + subpixel +
ops.peaks.localpeak_mean bit-for-bit (tests/test_pallas.py) and compiles and
runs correctly on the real chip (TPU v5e, jax 0.9).

Measured (v5e, 256×17×64×48): 5.1 ms vs 2.2 ms for the XLA-fused jnp ops —
XLA's automatic fusion wins here because the one-sample-per-program grid
under-utilizes the VPU and the Mosaic-compatible one-hot reductions cost
more than XLA's native gathers.  The kernel therefore stays opt-in
(ScoringEngine keeps the XLA path); it documents the Mosaic constraints that
shaped it (no reshape across the lane dim, no gather/take_along_axis, no
reduce_window/dynamic_update_slice, no 1-D vectors, (8, 128)-tiled outputs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_ROWS = 8


def _kernel(hm_ref, out_ref):
    hm = hm_ref[0]                         # block (1, K, H, W) -> (K, H, W)
    K, H, W = hm.shape
    # Mosaic can't reshape (K, H, W) -> (K, H*W); stay in the native layout.
    yi = jax.lax.broadcasted_iota(jnp.int32, (K, H, W), 1)
    xi = jax.lax.broadcasted_iota(jnp.int32, (K, H, W), 2)
    flat_pos = yi * W + xi
    # keep every intermediate >= 2-D (Mosaic's layout pass aborts on 1-D
    # vectors on this backend): per-joint scalars live as (K, 1)
    maxv = jnp.max(hm, axis=2)                       # (K, H)
    maxv = jnp.max(maxv, axis=1, keepdims=True)      # (K, 1)
    # row-major first-match argmax == min flat index among maxima
    big = jnp.int32(H * W)
    idx = jnp.min(jnp.where(hm == maxv[:, :, None], flat_pos, big),
                  axis=2)                            # (K, H)
    idx = jnp.min(idx, axis=1, keepdims=True)        # (K, 1)
    px = idx % W
    py = idx // W

    # neighbor values at the peak for the subpixel shift (clamped; the
    # caller masks the border condition exactly like the reference).
    # take_along_axis/gather doesn't lower in Mosaic — use one-hot
    # mask-reductions instead (a VPU-friendly select+sum).
    pxc = jnp.clip(px, 1, W - 2)                     # (K, 1)
    pyc = jnp.clip(py, 1, H - 2)

    def gather(yy, xx):
        target = (yy * W + xx)[:, :, None]           # (K, 1, 1)
        hit = jnp.where(flat_pos == target, hm, 0.0)
        return jnp.sum(jnp.sum(hit, axis=2), axis=1, keepdims=True)  # (K,1)

    left = gather(pyc, pxc - 1)
    right = gather(pyc, pxc + 1)
    up = gather(pyc - 1, pxc)
    down = gather(pyc + 1, pxc)

    # 3x3 max filter with constant-0 border via masked rolls
    # (reduce_window and dynamic_update_slice don't lower in Mosaic)
    yi = jax.lax.broadcasted_iota(jnp.int32, (K, H, W), 1)
    xi = jax.lax.broadcasted_iota(jnp.int32, (K, H, W), 2)
    mf = jnp.full((K, H, W), -jnp.inf, hm.dtype)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            # value at (y, x) of the shifted view = hm[y+dy, x+dx] (0 outside)
            r = hm
            if dy:
                r = pltpu.roll(r, -dy % H, 1)
            if dx:
                r = pltpu.roll(r, -dx % W, 2)
            inb = ((yi + dy >= 0) & (yi + dy < H)
                   & (xi + dx >= 0) & (xi + dx < W))
            mf = jnp.maximum(mf, jnp.where(inb, r, 0.0))
    is_peak = hm == mf
    keep = is_peak & (hm >= maxv[:, :, None] * 0.5)
    kept = jnp.where(keep, hm, 0.0)
    peak_sum = jnp.sum(jnp.sum(kept, axis=2), axis=1, keepdims=True)  # (K,1)
    peak_cnt = jnp.sum(jnp.sum(keep.astype(hm.dtype), axis=2), axis=1,
                       keepdims=True)

    # assemble the packed (8, 128) tile: row r, lane k (< K) holds quantity
    # r of joint k.  Each row is built as (1, LANES) via a one-hot (K, LANES)
    # selector (no 1-D shapes anywhere).
    sel = (jax.lax.broadcasted_iota(jnp.int32, (K, _LANES), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (K, _LANES), 1))
    sel_f = sel.astype(jnp.float32)                  # (K, LANES) one-hot

    def to_row(q):                                   # (K, 1) -> (1, LANES)
        return jnp.sum(q * sel_f, axis=0, keepdims=True)

    row7 = jnp.concatenate(
        [peak_sum.sum(axis=0, keepdims=True),
         peak_cnt.sum(axis=0, keepdims=True),
         jnp.zeros((1, _LANES - 2), jnp.float32)], axis=1)
    tile = jnp.concatenate([to_row(px.astype(jnp.float32)),
                            to_row(py.astype(jnp.float32)), to_row(maxv),
                            to_row(left), to_row(right), to_row(up),
                            to_row(down), row7], axis=0)
    out_ref[0] = tile


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_postprocess(hms, interpret: bool = False):
    """hms: (N, K, H, W) float32, K <= 128.

    Returns (coords (N, K, 2) refined like the reference decode,
             maxvals (N, K), gc (N,) local-peak mean).
    """
    N, K, H, W = hms.shape
    assert K <= _LANES
    packed = pl.pallas_call(
        _kernel,
        grid=(N,),
        in_specs=[pl.BlockSpec((1, K, H, W), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, _ROWS, _LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, _ROWS, _LANES), jnp.float32),
        interpret=interpret,
    )(hms)

    px = packed[:, 0, :K]
    py = packed[:, 1, :K]
    maxvals = packed[:, 2, :K].astype(hms.dtype)
    left, right = packed[:, 3, :K], packed[:, 4, :K]
    up, down = packed[:, 5, :K], packed[:, 6, :K]
    peak_sum, peak_cnt = packed[:, 7, 0], packed[:, 7, 1]

    coords = jnp.stack([px, py], axis=-1)
    masked = coords * (maxvals > 0)[..., None].astype(coords.dtype)
    pxi = jnp.round(masked[..., 0]).astype(jnp.int32)
    pyi = jnp.round(masked[..., 1]).astype(jnp.int32)
    ok = (pxi > 1) & (pxi < W - 1) & (pyi > 1) & (pyi < H - 1)
    shift = jnp.stack([jnp.sign(right - left), jnp.sign(down - up)],
                      axis=-1) * 0.25
    refined = masked + shift * ok[..., None].astype(coords.dtype)
    gc = peak_sum / jnp.maximum(peak_cnt, 1.0)
    return refined, maxvals, gc.astype(hms.dtype)
