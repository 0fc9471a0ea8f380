"""Local-peak operations on heatmaps — batched JAX.

Parity targets (reference, /root/reference):
  - active_learning/local_peak.py:5-22 (localpeak_values / localpeak_mean):
    3x3 maximum_filter with constant-0 border; peaks are pixels equal to the
    filtered max; keep peaks >= (per-map global max) * order; mean over all
    kept peaks of all K maps.
  - active_learning/ActiveLearning.py:762-796 (compute_mpe / compute_margin /
    compute_entropy) built on skimage peak_local_max(min_distance=5,
    num_peaks=5): 11x11 Chebyshev local maxima, strictly above the map's
    global min, excluding a 5-pixel border, top-5 by intensity with
    min-distance suppression, returned in descending intensity order.

scipy.ndimage.maximum_filter ≡ max-pool; implemented as reduce_window so the
whole (N, K, H, W) stack runs in one fused XLA op.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "max_filter2d",
    "localpeak_mean",
    "peak_local_max_topk",
    "compute_mpe",
    "compute_margin",
    "compute_entropy",
]

_NEG = -3.4e38  # large negative for masking (fits float32)


def max_filter2d(x, size: int, pad_value: float = 0.0):
    """Sliding-window max over the last two dims with constant padding.

    Equivalent to scipy.ndimage.maximum_filter(x, size, mode='constant',
    cval=pad_value) applied per 2-D slice.
    """
    r = size // 2
    return jax.lax.reduce_window(
        x, jnp.asarray(pad_value, x.dtype), jax.lax.max,
        window_dimensions=(1,) * (x.ndim - 2) + (size, size),
        window_strides=(1,) * x.ndim,
        padding=[(0, 0)] * (x.ndim - 2) + [(r, r), (r, r)])


def localpeak_mean(hms, filter_size: int = 3, order: float = 0.5):
    """Mean of all kept local-peak values over the K maps of each sample.

    hms: (..., K, H, W) -> (...,) float32.
    Parity: local_peak.py:12-22.  Per map: peaks = {p : x[p] == maxfilt(x)[p]},
    kept if x[p] >= max(x) * order (note: max over *peak* values equals the
    global max since the argmax is always a peak).  The mean pools peak values
    across all K maps of a sample.  bf16 inputs are upcast to f32 at entry
    (exact; fuses into the first read).
    """
    hms = jnp.asarray(hms)
    # the 3x3 max filter + peak-equality run in the INPUT dtype: max and ==
    # commute with the (injective, exact) bf16->f32 upcast, so the keep mask
    # is bit-identical to upcasting first while the reduce_window — the HBM
    # hot spot of this op — moves half the bytes under bf16 serving
    mf = max_filter2d(hms, filter_size, 0.0)
    is_peak = hms == mf
    hf = hms.astype(jnp.float32)
    gmax = jnp.max(hf, axis=(-2, -1), keepdims=True)
    keep = is_peak & (hf >= gmax * order)
    s = jnp.sum(jnp.where(keep, hf, 0.0), axis=(-3, -2, -1))
    c = jnp.sum(keep, axis=(-3, -2, -1))
    return s / jnp.maximum(c, 1)


def peak_local_max_topk(hm, min_distance: int = 5, num_peaks: int = 5):
    """Top-k local peak values of one 2-D map, descending, with validity mask.

    Replicates skimage.feature.peak_local_max(min_distance=5, num_peaks=5)
    as used by the reference (ActiveLearning.py:770, :784):
      * candidate = pixel equal to the 11x11 Chebyshev max (constant-0 pad)
        and strictly greater than the map's global min,
      * peaks within `min_distance` of the border are excluded,
      * iterative selection by descending value with Chebyshev suppression
        (== argsort + ensure_spacing; argmax first-match == stable-sort ties).

    hm: (H, W).  Returns (vals (num_peaks,), valid (num_peaks,) bool).
    """
    H, W = hm.shape
    size = 2 * min_distance + 1
    mf = max_filter2d(hm[None, None], size, 0.0)[0, 0]
    gmin = jnp.min(hm)
    mask = (hm == mf) & (hm > gmin)
    yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    border = ((yy >= min_distance) & (yy < H - min_distance)
              & (xx >= min_distance) & (xx < W - min_distance))
    mask = mask & border
    cand = jnp.where(mask, hm, _NEG)

    def body(carry, _):
        cand = carry
        flat = cand.reshape(-1)
        idx = jnp.argmax(flat)
        val = flat[idx]
        py = idx // W
        px = idx % W
        ok = val > _NEG / 2
        # Chebyshev suppression around the chosen peak.
        supp = (jnp.abs(yy - py) <= min_distance) & (jnp.abs(xx - px) <= min_distance)
        cand = jnp.where(supp, _NEG, cand)
        return cand, (val, ok)

    _, (vals, valid) = jax.lax.scan(body, cand, None, length=num_peaks)
    return vals, valid


_peaks_per_joint = jax.vmap(peak_local_max_topk, in_axes=(0, None, None))


def compute_mpe(hms, min_distance: int = 5, num_peaks: int = 5):
    """Multiple-peak entropy (ActiveLearning.py:762-778), batched.

    hms: (..., K, H, W) -> (...,).  Per joint map: softmax over the top-5 peak
    values, Shannon entropy, summed over joints (maps with zero peaks add 0).
    """
    hms = jnp.asarray(hms, jnp.float32)
    lead = hms.shape[:-2]
    flat = hms.reshape((-1,) + hms.shape[-2:])
    vals, valid = _peaks_per_joint(flat, min_distance, num_peaks)
    # masked softmax over valid peaks
    logits = jnp.where(valid, vals, -jnp.inf)
    p = jax.nn.softmax(logits, axis=-1)
    p = jnp.where(valid, p, 0.0)
    ent = -jnp.sum(jnp.where(p > 0, p * jnp.log(p), 0.0), axis=-1)
    ent = jnp.where(jnp.any(valid, axis=-1), ent, 0.0)
    return jnp.sum(ent.reshape(lead), axis=-1)


def compute_margin(hms, min_distance: int = 5, num_peaks: int = 5):
    """Top-2 peak margin (ActiveLearning.py:780-788), batched.
    |peak0 - peak1| summed over joints; maps with <2 peaks add 0."""
    hms = jnp.asarray(hms, jnp.float32)
    lead = hms.shape[:-2]
    flat = hms.reshape((-1,) + hms.shape[-2:])
    vals, valid = _peaks_per_joint(flat, min_distance, num_peaks)
    m = jnp.abs(vals[:, 0] - vals[:, 1])
    m = jnp.where(valid[:, 1], m, 0.0)
    return jnp.sum(m.reshape(lead), axis=-1)


def compute_entropy(hms):
    """Flat-heatmap entropy (ActiveLearning.py:790-796), batched.

    Mirrors scipy.stats.entropy per joint map: pk normalized by its sum, then
    sum of entr(p) (entr(x<0) = -inf, matching scipy when a heatmap holds
    negative values).  Summed over joints.
    """
    hms = jnp.asarray(hms, jnp.float32)
    flat = hms.reshape(hms.shape[:-2] + (-1,))
    p = flat / jnp.sum(flat, axis=-1, keepdims=True)
    entr = jnp.where(p > 0, -p * jnp.log(p),
                     jnp.where(p == 0, 0.0, -jnp.inf))
    return jnp.sum(entr, axis=(-2, -1))
