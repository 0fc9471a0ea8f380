"""Isolate the cost inside the rot-warp shear kernel (29.5 ms/pass for
1.18 GB of traffic = 25x off HBM speed-of-light at batch 120, canvas 640).

Variants (same traffic, different inner ops):
  copy    tile-loop that only reads/writes each 8-row tile
  dyn     + the per-tile dynamic pltpu.roll
  static  + the 11-candidate static roll/select chain (no dynamic roll)
  fir     dynamic roll + FIR accumulation (roll -1, fma) — candidate fix
  v1      the shipped kernel (_shear_pass)

Usage: python exp/profile_shear_variants.py [variant ...]
"""

import functools
import json
import sys

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from vatl4pose_tpu.utils.runtime import setup_jax_cache  # noqa: E402
setup_jax_cache()
from bench import _bench_chain_static as _bench_chain  # noqa: E402
from vatl4pose_tpu.kernels import rot_warp  # noqa: E402

BATCH = 120
S = rot_warp.CANVAS
TILE = rot_warp._TILE
MAXD = rot_warp._MAXD


def _k_copy(shift_ref, img_ref, out_ref):
    n_tiles = S // TILE

    def body(i, _):
        y0 = pl.multiple_of(i * TILE, TILE)
        out_ref[0, 0, pl.ds(y0, TILE), :] = img_ref[0, 0, pl.ds(y0, TILE), :]
        return 0
    jax.lax.fori_loop(0, n_tiles, body, 0)


def _k_dyn(shift_ref, img_ref, out_ref):
    n_tiles = S // TILE

    def body(i, _):
        y0 = pl.multiple_of(i * TILE, TILE)
        t = shift_ref[0, pl.ds(y0, TILE), 0]
        k0 = jnp.min(jnp.floor(t).astype(jnp.int32))
        tile = img_ref[0, 0, pl.ds(y0, TILE), :]
        base = pltpu.roll(tile, jnp.remainder(-k0, S), axis=1)
        out_ref[0, 0, pl.ds(y0, TILE), :] = base
        return 0
    jax.lax.fori_loop(0, n_tiles, body, 0)


def _k_static(shift_ref, img_ref, out_ref):
    n_tiles = S // TILE

    def body(i, _):
        y0 = pl.multiple_of(i * TILE, TILE)
        t = shift_ref[0, pl.ds(y0, TILE), 0]
        k = jnp.floor(t)
        f = (t - k).astype(jnp.float32)
        d = k.astype(jnp.int32) - jnp.min(k.astype(jnp.int32))
        tile = img_ref[0, 0, pl.ds(y0, TILE), :]
        base = tile
        r0 = jnp.zeros_like(tile)
        r1 = jnp.zeros_like(tile)
        cand = base
        for dd in range(MAXD + 1):
            sel0 = (d == dd)[:, None]
            sel1 = (d + 1 == dd)[:, None]
            r0 = jnp.where(sel0, cand, r0)
            r1 = jnp.where(sel1, cand, r1)
            if dd < MAXD:
                cand = pltpu.roll(cand, S - 1, axis=1)
        out = (1.0 - f)[:, None] * r0 + f[:, None] * r1
        out_ref[0, 0, pl.ds(y0, TILE), :] = out
        return 0
    jax.lax.fori_loop(0, n_tiles, body, 0)


def _k_fir(shift_ref, img_ref, out_ref):
    n_tiles = S // TILE

    def body(i, _):
        y0 = pl.multiple_of(i * TILE, TILE)
        t = shift_ref[0, pl.ds(y0, TILE), 0]
        k = jnp.floor(t)
        f = (t - k).astype(jnp.float32)
        ki = k.astype(jnp.int32)
        k0 = jnp.min(ki)
        d = ki - k0
        xl = jax.lax.broadcasted_iota(jnp.int32, (TILE, S), 1)
        src0 = xl + ki[:, None]
        tile = img_ref[0, 0, pl.ds(y0, TILE), :]
        base = pltpu.roll(tile, jnp.remainder(-k0, S), axis=1)
        acc = jnp.zeros_like(tile)
        cand = base
        for dd in range(MAXD + 1):
            w = (jnp.where(d == dd, 1.0 - f, 0.0)
                 + jnp.where(d + 1 == dd, f, 0.0))
            acc = acc + w[:, None] * cand
            if dd < MAXD:
                cand = pltpu.roll(cand, S - 1, axis=1)
        valid = (src0 >= 0) & (src0 < S)  # approximate edge mask (2nd tap
        # validity folded into the same mask — exactness not needed to TIME)
        out_ref[0, 0, pl.ds(y0, TILE), :] = jnp.where(valid, acc, 0.0)
        return 0
    jax.lax.fori_loop(0, n_tiles, body, 0)


def _k_r1(shift_ref, img_ref, out_ref):
    """v1 semantics, but the candidate chain uses roll-by-1 (single-stage
    lane shuffle) instead of roll-by-(S-1) (log-decomposed, ~8 stages):
    pre-roll the tile left by k0+MAXD once (dynamic), then walk dd from
    MAXD down to 0 with right-roll-by-1."""
    n_tiles = S // TILE

    def body(i, _):
        y0 = pl.multiple_of(i * TILE, TILE)
        t = shift_ref[0, pl.ds(y0, TILE), 0]
        k = jnp.floor(t)
        f = (t - k).astype(jnp.float32)
        ki = k.astype(jnp.int32)
        k0 = jnp.min(ki)
        d = ki - k0
        xl = jax.lax.broadcasted_iota(jnp.int32, (TILE, S), 1)
        src0 = xl + ki[:, None]
        valid0 = (src0 >= 0) & (src0 < S)
        valid1 = (src0 + 1 >= 0) & (src0 + 1 < S)
        tile = img_ref[0, 0, pl.ds(y0, TILE), :]
        # content left-shift by k0+MAXD in one dynamic roll
        base = pltpu.roll(tile, jnp.remainder(-(k0 + MAXD), S), axis=1)
        r0 = jnp.zeros_like(tile)
        r1 = jnp.zeros_like(tile)
        cand = base
        for dd in range(MAXD, -1, -1):
            # cand = content left-shifted by k0+dd
            sel0 = (d == dd)[:, None]
            sel1 = (d + 1 == dd)[:, None]
            r0 = jnp.where(sel0, cand, r0)
            r1 = jnp.where(sel1, cand, r1)
            if dd > 0:
                cand = pltpu.roll(cand, 1, axis=1)
        r0 = jnp.where(valid0, r0, 0.0)
        r1 = jnp.where(valid1, r1, 0.0)
        out = (1.0 - f)[:, None] * r0 + f[:, None] * r1
        out_ref[0, 0, pl.ds(y0, TILE), :] = out
        return 0
    jax.lax.fori_loop(0, n_tiles, body, 0)


def _k_rollsonly(shift_ref, img_ref, out_ref):
    n_tiles = S // TILE

    def body(i, _):
        y0 = pl.multiple_of(i * TILE, TILE)
        tile = img_ref[0, 0, pl.ds(y0, TILE), :]
        acc = jnp.zeros_like(tile)
        cand = tile
        for dd in range(MAXD + 1):
            acc = acc + cand
            if dd < MAXD:
                cand = pltpu.roll(cand, S - 1, axis=1)
        out_ref[0, 0, pl.ds(y0, TILE), :] = acc
        return 0
    jax.lax.fori_loop(0, n_tiles, body, 0)


def _k_selsonly(shift_ref, img_ref, out_ref):
    n_tiles = S // TILE

    def body(i, _):
        y0 = pl.multiple_of(i * TILE, TILE)
        t = shift_ref[0, pl.ds(y0, TILE), 0]
        d = jnp.floor(t).astype(jnp.int32)
        tile = img_ref[0, 0, pl.ds(y0, TILE), :]
        r0 = jnp.zeros_like(tile)
        r1 = jnp.zeros_like(tile)
        for dd in range(MAXD + 1):
            sel0 = (d == dd)[:, None]
            sel1 = (d + 1 == dd)[:, None]
            r0 = jnp.where(sel0, tile, r0)
            r1 = jnp.where(sel1, tile, r1)
        out_ref[0, 0, pl.ds(y0, TILE), :] = r0 + r1
        return 0
    jax.lax.fori_loop(0, n_tiles, body, 0)


def _run(kernel, canvas, shifts):
    shifts = shifts[:, :, None]
    N, C = canvas.shape[:2]
    return pl.pallas_call(
        kernel,
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
    )(shifts, canvas)


def main():
    which = sys.argv[1:] or ["copy", "dyn", "static", "fir", "v1"]
    rng = np.random.default_rng(0)
    canvas = jnp.asarray(rng.uniform(0, 255, (BATCH, 3, S, S)), jnp.float32)
    theta = rng.normal(0, 40, BATCH).clip(-70, 70) * np.pi / 180
    phi = jnp.asarray(theta.astype(np.float32))

    kernels = {"copy": _k_copy, "dyn": _k_dyn, "static": _k_static,
               "fir": _k_fir, "rollsonly": _k_rollsonly,
               "selsonly": _k_selsonly, "r1": _k_r1}

    def make(name):
        def mk(K):
            @jax.jit
            def loop(canvas):
                def body(i, acc):
                    c0 = canvas * (1 + acc * 1e-20)
                    sx, _ = rot_warp._rotation_shifts(phi, S)
                    if name == "v1":
                        c1 = rot_warp._shear_pass(c0, sx)
                    else:
                        c1 = _run(kernels[name], c0, sx)
                    return acc + jnp.sum(c1[0, 0, 0, :2])
                return lax.fori_loop(0, K, body, jnp.float32(0))
            return loop
        return mk

    for name in which:
        dt, _ = _bench_chain(make(name), canvas, iters=8)
        print(json.dumps({"variant": name, "ms": round(dt * 1e3, 2)}),
              flush=True)


if __name__ == "__main__":
    main()
