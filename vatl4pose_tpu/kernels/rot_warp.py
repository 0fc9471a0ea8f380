"""Rotation-capable batched affine warp without gathers (TPU).

The training augmentation warps person crops with dst->src affines of the
form M = R(theta) . (sigma F) — isotropic scale sigma (aspect-corrected
boxes, bbox.py:197-216 semantics), optional x-flip F, rotation up to
+-2*ROT_FACTOR degrees (simple_transform.py:212-217).  A general bilinear
gather costs ~3 ms/crop on v5e (gathers run at scalar rate, VERDICT r1 perf
follow-up), so this module computes the same warp with MXU/VPU-friendly
primitives only:

  1. an axis-aligned separable pre-crop (ops/warp.warp_axis_aligned_batch,
     two hat-weight einsums on the MXU) from the frame to a square padded
     canvas, applying sigma, the flip, and ALL translation;
  2. the residual pure rotation about the canvas center as THREE shear
     passes (the classic 3-shear rotation), each shear being a per-row
     fractional x-shift executed by a Pallas kernel built on
     `pltpu.roll` — one dynamic roll per 8-row tile plus a handful of
     static rolls, no per-element gathers.  The y-shear reuses the same
     kernel on the transposed canvas.

Numerics: rot == 0 rows degrade to exact identity shears, so the result
matches the single-pass bilinear warp exactly; rotated rows go through
three successive linear interpolations instead of one, a band-limited
approximation of single-pass bilinear (augmentation path only — the
rot=0 eval/scoring path never uses this module).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.warp import warp_axis_aligned_batch

__all__ = ["warp_rotated_batch", "decompose_inv_mats", "CANVAS"]

CANVAS = 640            # square canvas (multiple of 128): fits the rotated
                        # 256x192 footprint + worst-case shear excursions
                        # for |theta| <= 85 deg
_TILE = 8               # rows per dynamic roll
_MAXD = 10              # static residual roll candidates (ceil(8*sin85)+2)


def decompose_inv_mats(inv_mats: np.ndarray, out_size, canvas: int = CANVAS):
    """Split dst->src affines M x + t into (pre-stage mats, theta).

    Returns (pre_mats (N,2,3) canvas->src axis-aligned affines carrying
    sigma/flip/translation, theta (N,) radians of the residual rotation
    about the canvas center).  Requires isotropic |col0| == |col1| (always
    true for aspect-corrected person boxes); callers should fall back to
    the gather warp if `isotropy_error` exceeds tolerance.
    """
    inv_mats = np.asarray(inv_mats, np.float64)
    m = inv_mats[:, :, :2]
    t = inv_mats[:, :, 2]
    a = np.hypot(m[:, 0, 0], m[:, 1, 0])          # |col0| = sigma
    c = np.hypot(m[:, 0, 1], m[:, 1, 1])          # |col1| = sigma
    det = m[:, 0, 0] * m[:, 1, 1] - m[:, 0, 1] * m[:, 1, 0]
    flip = det < 0
    # M = R(theta) . diag(sx, sy): sx = +-sigma (flip), sy = +sigma
    # col0 = (cos t * sx, sin t * sx): for flip, col0 points along t+pi
    theta = np.arctan2(m[:, 1, 0], m[:, 0, 0])
    theta = np.where(flip, np.arctan2(-m[:, 1, 0], -m[:, 0, 0]), theta)
    sx = np.where(flip, -a, a)
    sy = c
    # canvas coords u: crop pixel x sits at u = x + off (crop centered);
    # the rotation stage reads canvas1[u] = canvas0[R(theta)(u-ctr)+ctr];
    # the pre stage must then satisfy
    #   canvas0[v] = frame[diag(sx,sy)(v-ctr) + q]
    # with q chosen so the composition equals M x + t for crop pixels:
    #   M x + t = R diag (x + off - ctr) + ... -> q = t + diag(sx,sy)ctr'
    # where ctr' accounts for the crop-center offset.  Derivation:
    #   compose(v) = diag(sx,sy)(R(t)(u-ctr)+ctr-ctr) + q
    #              = diag(sx,sy) R(theta) (u-ctr) + q
    #   and diag(sx,sy) R(theta) = ... NOT equal R diag in general —
    # but R(theta) diag(s, s) = diag(s, s) R(theta) for isotropic |s|,
    # and the flip sign conjugates the rotation:
    #   diag(-s,s) R(-theta) = R(theta) diag(-s,s).
    # So run the canvas rotation with angle phi = -theta for flipped
    # samples, +theta otherwise, and the scale/flip in the pre stage:
    #   compose(u) = diag(sx,sy) R(phi') (u-ctr) + q  with
    #   diag(sx,sy) R(phi') == R(theta) diag(sx,sy)  when
    #   phi' = theta for sx>0, phi' = -theta for sx<0.
    # Then need q = M ctr_eff + t where ctr_eff maps the canvas center
    # back to the crop pixel it represents.
    oh, ow = int(out_size[0]), int(out_size[1])
    ctr = (canvas - 1) / 2.0
    off_x = ctr - (ow - 1) / 2.0                   # crop x -> canvas u
    off_y = ctr - (oh - 1) / 2.0
    # crop pixel x corresponds to canvas u = x + off; the canvas-center
    # crop coords: x_c = ctr - off = (ow-1)/2, y_c = (oh-1)/2
    xc = np.array([(ow - 1) / 2.0, (oh - 1) / 2.0])
    # pre-stage: canvas0[v] = frame[diag(sx,sy)(v - ctr) + q],
    # q = M xc + t  (the source point under the crop center)
    q = m @ xc + t                                 # (N, 2)
    pre = np.zeros((len(inv_mats), 2, 3), np.float32)
    pre[:, 0, 0] = sx
    pre[:, 1, 1] = sy
    pre[:, 0, 2] = q[:, 0] - sx * ctr
    pre[:, 1, 2] = q[:, 1] - sy * ctr
    phi = np.where(sx < 0, -theta, theta)
    iso_err = np.abs(a - c) / np.maximum(a, 1e-6)
    return pre, phi.astype(np.float32), float(iso_err.max())


# ---------------------------------------------------------------------------
# pallas shear pass
# ---------------------------------------------------------------------------

def _shear_kernel(shift_ref, img_ref, out_ref):
    """Per-row fractional x-shift of one (S, S) canvas channel.

    shift_ref: (1, S, 1) f32 — source x-offset per row (canvas coords:
    row y reads source x = x + shift[y]).  Executed as one dynamic
    `pltpu.roll` per 8-row tile plus static residual rolls + selects.
    """
    S = img_ref.shape[2]
    n_tiles = S // _TILE

    def tile_body(i, _):
        y0 = pl.multiple_of(i * _TILE, _TILE)
        t = shift_ref[0, pl.ds(y0, _TILE), 0]              # (T,)
        k = jnp.floor(t)
        f = (t - k).astype(jnp.float32)                    # (T,)
        ki = k.astype(jnp.int32)
        k0 = jnp.min(ki)
        d = ki - k0                                        # (T,) in [0,_MAXD)
        # lane iota for masking + per-row source validity
        xl = jax.lax.broadcasted_iota(jnp.int32, (_TILE, S), 1)
        src0 = xl + ki[:, None]                            # integer src x
        valid0 = (src0 >= 0) & (src0 < S)
        valid1 = (src0 + 1 >= 0) & (src0 + 1 < S)
        shift_right = jnp.remainder(-k0, S)

        tile = img_ref[0, 0, pl.ds(y0, _TILE), :]          # (T, S)
        base = pltpu.roll(tile, shift_right, axis=1)       # left-roll by k0
        r0 = jnp.zeros_like(tile)
        r1 = jnp.zeros_like(tile)
        cand = base
        for dd in range(_MAXD + 1):
            # cand = base left-rolled by dd (static)
            sel0 = (d == dd)[:, None]
            sel1 = (d + 1 == dd)[:, None]
            r0 = jnp.where(sel0, cand, r0)
            r1 = jnp.where(sel1, cand, r1)
            if dd < _MAXD:
                cand = pltpu.roll(cand, S - 1, axis=1)
        r0 = jnp.where(valid0, r0, 0.0)
        r1 = jnp.where(valid1, r1, 0.0)
        out = (1.0 - f)[:, None] * r0 + f[:, None] * r1
        out_ref[0, 0, pl.ds(y0, _TILE), :] = out
        return 0

    jax.lax.fori_loop(0, n_tiles, tile_body, 0)


def _shear_pass(canvas, shifts, *, interpret=False):
    """canvas: (N, C, S, S); shifts: (N, S) per-row x-offsets."""
    N, C, S, _ = canvas.shape
    shifts = shifts[:, :, None]          # (N, S, 1): sublane-sliceable
    return pl.pallas_call(
        _shear_kernel,
        out_shape=jax.ShapeDtypeStruct(canvas.shape, canvas.dtype),
        grid=(N, C),
        in_specs=[
            pl.BlockSpec((1, S, 1), lambda n, ch: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S, S), lambda n, ch: (n, ch, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, S, S), lambda n, ch: (n, ch, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(shifts, canvas)


# ---------------------------------------------------------------------------
# full warp
# ---------------------------------------------------------------------------

def _rotation_shifts(phi, S):
    """Per-row shift tables for the 3-shear rotation about the canvas
    center: R(phi) = Shx(tan(phi/2)) . Shy(-sin phi) . Shx(tan(phi/2)) as
    dst->src sampling offsets."""
    ctr = (S - 1) / 2.0
    rows = jnp.arange(S, dtype=jnp.float32) - ctr      # (S,)
    phi = -phi                                         # dst->src sampling
    t_half = jnp.tan(phi / 2.0)[:, None]               # (N, 1)
    s_sin = jnp.sin(phi)[:, None]
    shear_x = t_half * rows[None, :]                   # passes 1 and 3
    shear_y = -s_sin * rows[None, :]                   # pass 2 (transposed)
    return shear_x, shear_y


def warp_rotated_traced(frames, frame_idx, pre_mats, phi, out_size,
                        canvas: int = CANVAS, interpret: bool = False):
    """Jit-traceable body: pre_mats/phi from `decompose_inv_mats` (host).

    frames: (F, H, W, C) f32; returns (N, oh, ow, C) f32 crops.
    """
    oh, ow = int(out_size[0]), int(out_size[1])
    # decompose_inv_mats centers the crop continuously at (canvas-1)/2 while
    # the extraction below slices at integer (canvas-oh)//2 — for odd sizes
    # that would silently shift the crop by half a pixel
    assert oh % 2 == 0 and ow % 2 == 0, \
        f"warp_rotated_traced requires even crop sizes, got {(oh, ow)}"
    # pre-stage: separable MXU warp frame -> (N, S, S, C)
    c0 = warp_axis_aligned_batch(frames, frame_idx, pre_mats,
                                 (canvas, canvas))
    c0 = jnp.transpose(c0, (0, 3, 1, 2))               # (N, C, S, S)
    shear_x, shear_y = _rotation_shifts(phi, canvas)
    c1 = _shear_pass(c0, shear_x, interpret=interpret)
    c1t = jnp.swapaxes(c1, 2, 3)
    c2t = _shear_pass(c1t, shear_y, interpret=interpret)
    c2 = jnp.swapaxes(c2t, 2, 3)
    c3 = _shear_pass(c2, shear_x, interpret=interpret)
    y0 = (canvas - oh) // 2
    x0 = (canvas - ow) // 2
    crops = c3[:, :, y0:y0 + oh, x0:x0 + ow]
    return jnp.transpose(crops, (0, 2, 3, 1))          # (N, oh, ow, C)


def warp_rotated_batch(frames, frame_idx, inv_mats, out_size,
                       canvas: int = CANVAS, interpret: bool = False):
    """General train-aug warp: (N, oh, ow, C) float32 crops.

    frames: (F, H, W, C) f32; inv_mats: (N, 2, 3) dst->src with isotropic
    scale (+optional flip) and any rotation |theta| <= ~85 deg.
    """
    pre, phi, iso_err = decompose_inv_mats(np.asarray(inv_mats), out_size,
                                           canvas)
    if iso_err > 1e-3:
        raise ValueError(f"anisotropic affine (err {iso_err:.2g}) — use the "
                         "gather warp")
    return warp_rotated_traced(frames, frame_idx, jnp.asarray(pre),
                               jnp.asarray(phi), out_size, canvas,
                               interpret=interpret)
