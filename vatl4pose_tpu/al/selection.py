"""Query selection: influence, candidate ranking, filters, coreset.

Parity targets (reference ActiveLearning.py):
  - influence (:467-484): cosine-distance row sums over unlabeled embeddings
    (KNeighborsTransformer with n_neighbors=N-1 == full row sums since the
    self-distance is 0), min-max normalized.
  - score combination (:486-519): min-max normalized uncertainty, THC+WPU
    fusion with const/increase/decrease scheduling, combine-weight mix.
  - candidate ranking (:529-541): stable descending sort of (idx, score)
    (Python sorted is stable → ties keep unlabeled-id order).
  - filters (:553-619): weighted K-Means, K-Means, Diversity, Random,
    Coreset (k-center greedy with uncertainty-biased argmax :798-850).

Ranking/bookkeeping run on host in float64 numpy (tiny data, exact-parity
semantics); the O(N²) embedding distance work runs on device (MXU matmuls).
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp


__all__ = [
    "cosine_distance_rowsums", "influence_scores", "minmax", "fuse_thc_wpu",
    "total_scores", "rank_candidates", "kmeans_filter", "diversity_filter",
    "random_filter", "coreset_selection",
]


def minmax(x: np.ndarray) -> np.ndarray:
    """(x - min) / (max - min) — the reference's normalization; NaN/inf on
    constant input is inherited behavior (guarded by callers for N<=1)."""
    return (x - np.min(x)) / (np.max(x) - np.min(x))


@jax.jit
def _pairwise_cosine_dist(x):
    """1 - cos similarity, on device (one matmul on the MXU)."""
    norm = jnp.linalg.norm(x, axis=1, keepdims=True)
    xn = x / jnp.maximum(norm, 1e-12)
    return 1.0 - xn @ xn.T


def cosine_distance_rowsums(embeddings: np.ndarray) -> np.ndarray:
    d = np.array(_pairwise_cosine_dist(jnp.asarray(embeddings, jnp.float32)))
    np.fill_diagonal(d, 0.0)
    return d.sum(axis=1)


def influence_scores(embeddings_unlabeled: np.ndarray) -> np.ndarray:
    """ActiveLearning.py:470-478."""
    return minmax(cosine_distance_rowsums(embeddings_unlabeled))


def fuse_thc_wpu(thc: np.ndarray, wpu: np.ndarray, labeled_ratio: float,
                 mode: str = "const") -> np.ndarray:
    """THC+WPU fusion (:494-510): per-criterion min-max, scheduled mix,
    re-normalized."""
    t = minmax(np.asarray(thc, np.float64))
    w = minmax(np.asarray(wpu, np.float64))
    if mode == "const":
        u = t + w
    elif mode == "increase":
        u = labeled_ratio * t + (1 - labeled_ratio) * w
    elif mode == "decrease":
        u = (1 - labeled_ratio) * t + labeled_ratio * w
    else:
        raise ValueError(mode)
    return minmax(u)


def total_scores(uncertainty: Optional[np.ndarray],
                 influence: Optional[np.ndarray],
                 combine_weight: float) -> np.ndarray:
    """Combine normalized uncertainty and influence (:486-519).
    `uncertainty` here is already min-max normalized (or fused)."""
    if uncertainty is None and influence is None:
        raise ValueError("no scores")
    if uncertainty is None:
        return np.asarray(influence, np.float64)
    if influence is None:
        return np.asarray(uncertainty, np.float64)
    return combine_weight * uncertainty + (1 - combine_weight) * influence


def rank_candidates(unlabeled_ids: Sequence[int], scores: np.ndarray,
                    top_k: Optional[int] = None) -> List[int]:
    """Stable descending sort by score, then ascending-id sort of the kept
    slice (:529-541: sorted(...)[:k] then sorted(keys))."""
    ids = list(unlabeled_ids)
    order = np.argsort(-np.asarray(scores, np.float64), kind="stable")
    ranked = [ids[i] for i in order]
    if top_k is not None:
        ranked = ranked[:top_k]
    return sorted(ranked)


def kmeans_filter(embeddings: np.ndarray, candidate_list: List[int],
                  query_size: int, weight: Optional[np.ndarray] = None,
                  dedupe: bool = False, random_state: int = 318) -> List[int]:
    """K-Means / weighted K-Means filters (:553-580, :593-611): cluster the
    candidates (sklearn, seed 318), pick the closest-to-centroid member of
    each cluster.  With `weight`, samples are K-Means-weighted (weighted
    filter also dedupes identical embeddings first)."""
    from sklearn.cluster import KMeans
    emb = embeddings[candidate_list]
    w = weight
    if dedupe:
        _, keep = np.unique(emb, axis=0, return_index=True)
        emb = emb[keep]
        if w is not None:
            w = w[keep]
    else:
        keep = np.arange(len(emb))
    k = min(query_size, len(emb))
    km = KMeans(n_clusters=k, random_state=random_state, verbose=0)
    cluster_idx = km.fit_predict(emb, sample_weight=w)
    centers = km.cluster_centers_[cluster_idx]
    dis = ((emb - centers) ** 2).sum(axis=1)
    picked = []
    for c in range(len(np.unique(cluster_idx))):
        members = np.arange(emb.shape[0])[cluster_idx == c]
        picked.append(members[dis[cluster_idx == c].argmin()])
    if dedupe:
        picked = [int(keep[p]) for p in picked]
    return [int(candidate_list[p]) for p in picked]


def diversity_filter(embeddings: np.ndarray, candidate_list: List[int],
                     query_size: int) -> List[int]:
    """Diversity filter (:583-592): ascending cosine row-sum pick."""
    div = cosine_distance_rowsums(embeddings[candidate_list])
    pairs = sorted(zip(candidate_list, div), key=lambda x: x[1])
    return [int(i) for i, _ in pairs[:query_size]]


def random_filter(candidate_list: List[int], query_size: int,
                  rng: np.random.RandomState) -> List[int]:
    """random_query (:727-734): draw without replacement via np.random.choice
    loop (uses the global-np-random-equivalent RNG handed in)."""
    cands = list(candidate_list)
    out = []
    while len(out) < query_size and cands:
        q = int(rng.choice(cands))
        out.append(q)
        cands.remove(q)
    return out


def _coreset_host_f64(embeddings: np.ndarray, uncertainty: np.ndarray,
                      labeled_idx: Sequence[int], query_size: int,
                      unc_lambda: float, moks_queried: float, mode: str,
                      rng: Optional[np.random.RandomState]) -> List[int]:
    """Reference-exact f64 greedy (ActiveLearning.py:798-850) on host.

    Replicates the reference's arithmetic bit-for-bit: the reference holds
    `fvecs_matrix = np.zeros((N, 2048))` (float64, :270) and uncertainty
    `np.zeros(N)` (:610), computes distances through sklearn
    `pairwise_distances` (the a²+b²−2ab expansion, :809) and takes plain
    `np.argmax` — including its lack of a taken-mask: a picked item relies
    on min_dist=0/unc=0 to never win again (:846 comment), so callers must
    clamp query_size to the pickable pool (the AL engine does).
    """
    from sklearn.metrics import pairwise_distances

    enc = np.asarray(embeddings, np.float64)
    unc = np.asarray(uncertainty, np.float64).copy()
    n_labeled = len(labeled_idx)
    min_d = None
    if n_labeled > 0:
        d = pairwise_distances(enc, enc[np.asarray(labeled_idx, np.int64)],
                               metric="euclidean")
        min_d = np.min(d, axis=1).reshape(-1, 1)
    picks: List[int] = []
    for _ in range(int(query_size)):
        if min_d is None:  # no labeled centers yet: first-pick rule
            if mode == "plain":
                r = rng or np.random.RandomState()
                ind = int(r.choice(np.arange(enc.shape[0])))
            else:
                ind = int(np.argmax(unc))
        else:
            md = min_d.reshape(-1)
            if mode == "dynamic":
                ind = int(np.argmax((1.0 - moks_queried) * md
                                    + unc_lambda * moks_queried * unc))
            elif mode == "fixed":
                ind = int(np.argmax(md + unc_lambda * unc))
            else:
                ind = int(np.argmax(md))
        d = pairwise_distances(enc, enc[[ind]], metric="euclidean")
        min_d = d if min_d is None else np.minimum(min_d, d)
        unc[ind] = 0.0
        picks.append(ind)
    return picks


def coreset_selection(embeddings: np.ndarray, uncertainty: np.ndarray,
                      labeled_idx: Sequence[int], query_size: int,
                      unc_lambda: float, moks_queried: float,
                      mode: str = "dynamic",
                      rng: Optional[np.random.RandomState] = None,
                      precision: str = "f32") -> List[int]:
    """k-center greedy with uncertainty-biased argmax (:798-850), run on
    device with a lax.fori_loop over min-distance updates.

    mode: 'dynamic'  → argmax((1-mOKS)·min_dist + λ·mOKS·unc)
          'fixed'    → argmax(min_dist + λ·unc)
          'plain'    → argmax(min_dist)  (uncertainty None or λ == 0)
    First pick (no labeled data): argmax(unc) (dynamic/fixed) or uniform
    random (plain).  Selected items get uncertainty zeroed (:846).

    precision: 'f32' (default) runs the greedy on device in float32 —
    near-tie picks whose score gap sits below f32 resolution may swap vs
    the reference's float64 numpy.  'f64' runs the reference-exact host
    path (`_coreset_host_f64`) for bitwise greedy-order parity; enable via
    cfg VAL.CORESET_F64 when reproducing reference query orders matters
    more than device throughput.

    Shapes are bucketed (rows padded with -inf scores, loop length padded
    and sliced) so the compiled program is reused across rounds/videos.
    """
    if precision == "f64":
        return _coreset_host_f64(embeddings, uncertainty, labeled_idx,
                                 query_size, unc_lambda, moks_queried,
                                 mode, rng)
    from ..data.pipeline import bucket_size

    n_real = int(np.asarray(embeddings).shape[0])
    q_real = int(query_size)
    nb = bucket_size(n_real)
    qb = bucket_size(q_real, buckets=(8, 16, 32, 64, 128, 256, 512, 1024,
                                      2048, 4096))
    qb = min(qb, n_real)  # cannot pick more than the real pool
    emb_np = np.zeros((nb, np.asarray(embeddings).shape[1]), np.float32)
    emb_np[:n_real] = np.asarray(embeddings, np.float32)
    unc_np = np.full(nb, -np.inf, np.float32)
    unc_np[:n_real] = np.asarray(uncertainty, np.float32)
    valid_np = np.zeros(nb, bool)
    valid_np[:n_real] = True

    first_random = (mode == "plain") and len(labeled_idx) == 0
    first_idx = 0
    if first_random:
        rng = rng or np.random.RandomState()
        first_idx = int(rng.choice(np.arange(nb)))

    if len(labeled_idx) > 0:
        # pad the labeled set to the FULL embedding bucket (repeat the
        # first index — duplicate centers don't change the min distance):
        # the program then compiles once per (nb, qb, mode) instead of
        # once per labeled-set bucket per round (the round-1 select-phase
        # recompile spikes, ~8s each on rounds where the labeled bucket
        # grew).  The (nb × nb) distance matmul is MXU work, ~1 ms at 4k.
        li_np = np.asarray(labeled_idx, np.int32)
        li_np = np.concatenate(
            [li_np, np.full(nb - len(li_np), li_np[0], np.int32)])
        have_labeled = True
    else:
        li_np = np.zeros(nb, np.int32)
        have_labeled = False

    picks = _coreset_run(
        jnp.asarray(emb_np), jnp.asarray(unc_np), jnp.asarray(valid_np),
        jnp.asarray(li_np), jnp.asarray(moks_queried, jnp.float32),
        jnp.asarray(unc_lambda, jnp.float32),
        jnp.asarray(first_idx, jnp.int32), mode=mode, query_size=qb,
        have_labeled=have_labeled, first_random=first_random)
    return [int(p) for p in np.asarray(picks)[:q_real]]


@partial(jax.jit, static_argnames=("mode", "query_size", "have_labeled",
                                   "first_random"))
def _coreset_run(emb, unc0, valid, li, moks, lam, first_idx, *, mode,
                 query_size, have_labeled, first_random):
    """Compiled k-center greedy.  moks/λ are traced scalars (they change
    every round — baking them in as constants recompiled per round)."""
    sq = jnp.sum(emb * emb, axis=1)
    if have_labeled:
        d2 = sq[:, None] + sq[li][None, :] - 2.0 * (emb @ emb[li].T)
        init_min = jnp.min(jnp.sqrt(jnp.maximum(d2, 0.0)), axis=1)
        init_min = jnp.where(valid, init_min, -jnp.inf)
    else:
        init_min = jnp.where(valid, jnp.inf, -jnp.inf)

    if mode == "dynamic":
        def score(md, unc):
            return (1.0 - moks) * md + lam * moks * unc
    elif mode == "fixed":
        def score(md, unc):
            return md + lam * unc
    else:
        def score(md, unc):
            return md

    def body(i, state):
        min_d, unc, taken, picks = state
        # a previously picked item has min_dist 0 and unc 0, so the
        # reference expects it can never win again (ActiveLearning.py:845
        # comment) — but when scores degenerate to ties (e.g. bf16
        # embeddings collapsing many samples to identical values) argmax
        # re-picks the same index forever and the query list collapses on
        # dedupe.  Enforce the reference's stated invariant with an
        # explicit mask: pick only among not-yet-picked valid items.
        ok = valid & ~taken
        # first pick with no labeled centers: argmax(unc) (or a preselected
        # random index for 'plain' mode)
        no_centers = (jnp.where(valid, min_d, jnp.inf) == jnp.inf).all()
        ind_unc = jnp.argmax(jnp.where(ok, unc, -jnp.inf))
        # evaluate the score on sanitized inputs then mask the padding —
        # -inf arithmetic (e.g. 0 * -inf) breeds NaNs that win argmax
        sc = score(jnp.where(valid, min_d, 0.0), jnp.where(valid, unc, 0.0))
        ind_score = jnp.argmax(jnp.where(ok, sc, -jnp.inf))
        ind = jnp.where(no_centers,
                        first_idx if first_random else ind_unc, ind_score)
        # exact per-center distances (avoids the a²+b²-2ab cancellation)
        dn = jnp.sqrt(jnp.sum(jnp.square(emb - emb[ind]), axis=1))
        min_d = jnp.where(valid, jnp.minimum(min_d, dn), -jnp.inf)
        unc = unc.at[ind].set(0.0)
        taken = taken.at[ind].set(True)
        picks = picks.at[i].set(ind)
        return (min_d, unc, taken, picks)

    picks0 = jnp.zeros((query_size,), jnp.int32)
    # initial centers are masked too: a labeled sample scores exactly 0
    # (min_dist 0, unc 0), which ties with degenerate candidates and can
    # win argmax — re-querying it would be a no-op for the labeled set
    taken0 = jnp.zeros(emb.shape[0], bool)
    if have_labeled:
        taken0 = taken0.at[li].set(True)
    _, _, _, picks = jax.lax.fori_loop(0, query_size, body,
                                       (init_min, unc0, taken0, picks0))
    return picks
