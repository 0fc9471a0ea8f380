"""VL4Pose skeleton-likelihood scoring — batched JAX.

Parity target: active_learning/VL4Pose/Keypoint.py:53-128 (max-likelihood
tree parse over per-joint local peaks) and ActiveLearning.py:1108-1163 (the
auxiliary-network Gaussian NLL training objective).  The reference's scoring
dispatch is broken (undefined variables); semantics here follow the code's
evident intent, vectorized:

  * per joint: top-K local peaks (Chebyshev min_distance suppression),
    softmax over peak values;
  * tree recursion (bottom-up over the fixed COCO link tree): the value a
    child contributes to a parent candidate p is
        sum_c [ log softmax-peak(c) + logN(||p - c||; μ, σ²) + children(c) ]
    (the reference propagates sums over candidate locations, not maxes —
    Keypoint.py:116 `np.sum(likelihood_per_location)`);
  * sample score = sum over root candidates of
        log softmax-peak(root) + Σ child contributions — Keypoint.py:83.

Uncertainty = -score (higher = less consistent skeleton).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..models.auxnet import COCO_LINKS

__all__ = ["vl4pose_scores", "auxnet_nll_loss", "pairwise_link_distances"]

_LOG2PI = float(np.log(2 * np.pi))


def _topk_peaks_with_loc(hm, min_distance: int, num_peaks: int):
    """(vals, valid) plus integer (y, x) peak locations."""
    H, W = hm.shape
    from .peaks import max_filter2d, _NEG
    size = 2 * min_distance + 1
    mf = max_filter2d(hm[None, None], size, 0.0)[0, 0]
    gmin = jnp.min(hm)
    yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    border = ((yy >= min_distance) & (yy < H - min_distance)
              & (xx >= min_distance) & (xx < W - min_distance))
    cand = jnp.where((hm == mf) & (hm > gmin) & border, hm, _NEG)

    def body(carry, _):
        cand = carry
        idx = jnp.argmax(cand.reshape(-1))
        val = cand.reshape(-1)[idx]
        py, px = idx // W, idx % W
        ok = val > _NEG / 2
        supp = (jnp.abs(yy - py) <= min_distance) & \
               (jnp.abs(xx - px) <= min_distance)
        return jnp.where(supp, _NEG, cand), (val, ok, py, px)

    _, (vals, valid, pys, pxs) = jax.lax.scan(body, cand, None,
                                              length=num_peaks)
    return vals, valid, pys, pxs


def vl4pose_scores(hms, params, links=COCO_LINKS, min_distance: int = 5,
                   num_peaks: int = 5):
    """Negative tree log-likelihood per sample.

    hms: (N, K, H, W); params: (N, L, 2) per-link (μ, log σ²) from AuxNet.
    Returns (N,) uncertainty.
    """
    N, K, H, W = hms.shape
    flat = jnp.asarray(hms, jnp.float32).reshape(N * K, H, W)
    vals, valid, pys, pxs = jax.vmap(
        lambda h: _topk_peaks_with_loc(h, min_distance, num_peaks))(flat)
    P = num_peaks
    vals = vals.reshape(N, K, P)
    valid = valid.reshape(N, K, P)
    locs = jnp.stack([pys.reshape(N, K, P), pxs.reshape(N, K, P)],
                     axis=-1).astype(jnp.float32)
    # softmax over valid peaks (Keypoint_ParallelWrapper: softmax(peaks))
    logits = jnp.where(valid, vals, -jnp.inf)
    logp = jax.nn.log_softmax(logits, axis=-1)
    logp = jnp.where(valid, logp, 0.0)

    links = np.asarray(links)
    K_joints = K
    # children lists per joint (static python structure)
    children = {j: [] for j in range(K_joints)}
    for li, (u, v) in enumerate(links):
        children[int(u)].append((int(v), li))

    # bottom-up order: reverse topological from root 0
    order = []
    stack = [0]
    while stack:
        j = stack.pop()
        order.append(j)
        for (c, _) in children[j]:
            stack.append(c)
    order = order[::-1]  # leaves first

    # value[j]: (N, P) contribution of subtree rooted at j, per candidate
    value = {j: logp[:, j, :] for j in range(K_joints)}
    for j in order:
        for (c, li) in children[j]:
            # pairwise distances parent-candidates x child-candidates
            d = jnp.linalg.norm(locs[:, j, :, None, :]
                                - locs[:, c, None, :, :], axis=-1)
            mu = params[:, li, 0][:, None, None]
            logvar = params[:, li, 1][:, None, None]
            log_n = -0.5 * (_LOG2PI + logvar
                            + (mu - d) ** 2 * jnp.exp(-logvar))
            contrib = value[c][:, None, :] + log_n        # (N, P, P)
            contrib = jnp.where(valid[:, c, None, :], contrib, 0.0)
            # reference propagates the SUM over child candidates
            value[j] = value[j] + jnp.sum(contrib, axis=-1)
    root_vals = jnp.where(valid[:, 0, :], value[0], 0.0)
    max_ll = jnp.sum(root_vals, axis=-1)                  # Keypoint.py:83
    return -max_ll


def pairwise_link_distances(coords, links=COCO_LINKS):
    """coords (N, K, 2) → per-link joint distances (N, L)."""
    links = jnp.asarray(np.asarray(links))
    a = coords[:, links[:, 0], :]
    b = coords[:, links[:, 1], :]
    return jnp.linalg.norm(a - b, axis=-1)


def auxnet_nll_loss(params, link_dists, link_exist):
    """Gaussian NLL of observed link distances (ActiveLearning.py:1155-1160):
    mean over links of [0.5 (μ-d)² e^{-logσ²} + 0.5 logσ²] · exist."""
    mu, logvar = params[..., 0], params[..., 1]
    resid = 0.5 * (mu - link_dists) ** 2 * jnp.exp(-logvar)
    nll = (resid + 0.5 * logvar) * link_exist
    return jnp.mean(nll)
