"""Selection-stack tests vs plain-numpy replicas of the reference
algorithms (ActiveLearning.py:467-850)."""

import numpy as np
import pytest

from vatl4pose_tpu.al import selection as S
from vatl4pose_tpu.al.index_sets import IndexCollection

RNG = np.random.default_rng(318)


def ref_coreset(embeddings, uncertainty, labeled_idx, query_size, unc_lambda,
                moks, mode):
    """Replica of coreset_selection (ActiveLearning.py:798-850)."""
    from sklearn.metrics import pairwise_distances
    unc = uncertainty.copy()
    labeled = list(labeled_idx)
    min_d = None
    if labeled:
        dist = pairwise_distances(embeddings, embeddings[labeled],
                                  metric="euclidean")
        min_d = np.min(dist, axis=1)
    out = []
    for _ in range(query_size):
        if not labeled:
            ind = int(np.argmax(unc))
        elif mode == "dynamic":
            ind = int(np.argmax((1 - moks) * min_d + unc_lambda * moks * unc))
        elif mode == "fixed":
            ind = int(np.argmax(min_d + unc_lambda * unc))
        else:
            ind = int(np.argmax(min_d))
        d = np.linalg.norm(embeddings - embeddings[ind], axis=1)
        min_d = d if min_d is None else np.minimum(min_d, d)
        labeled.append(ind)
        unc[ind] = 0
        out.append(ind)
    return out


class TestCoreset:
    @pytest.mark.parametrize("mode", ["dynamic", "fixed"])
    def test_matches_reference_greedy(self, mode):
        emb = RNG.normal(0, 1, size=(60, 32)).astype(np.float32)
        unc = RNG.uniform(0, 1, size=60)
        labeled = [3, 17, 42]
        golden = ref_coreset(emb, unc.copy(), labeled, 10, 0.01, 0.7, mode)
        got = S.coreset_selection(emb, unc.copy(), labeled, 10, 0.01, 0.7,
                                  mode=mode)
        assert got == golden

    def test_first_pick_is_argmax_uncertainty(self):
        emb = RNG.normal(0, 1, size=(30, 8)).astype(np.float32)
        unc = RNG.uniform(0, 1, size=30)
        got = S.coreset_selection(emb, unc.copy(), [], 5, 0.01, 0.7,
                                  mode="dynamic")
        assert got[0] == int(np.argmax(unc))
        assert len(set(got)) == 5  # no repeats (selected unc zeroed, dist 0)

    def test_degenerate_ties_still_fill_the_query(self):
        """bf16 regression: when embeddings collapse to identical rows every
        score ties at 0 after the first pick, and an unmasked argmax
        re-picks the same index (or an already-labeled one) forever — the
        query list then collapses on dedupe and the AL loop stalls below
        100% labeled.  Distinct not-yet-picked unlabeled picks are the
        reference's stated invariant (ActiveLearning.py:845)."""
        emb = np.ones((40, 16), np.float32)          # all identical
        unc = np.zeros(40)
        labeled = [0, 1, 2]
        got = S.coreset_selection(emb, unc.copy(), labeled, 10, 0.01, 0.7,
                                  mode="dynamic")
        assert len(set(got)) == 10                   # all distinct
        assert not set(got) & set(labeled)           # none already labeled


class TestInfluence:
    def test_matches_sklearn_knn_rowsums(self):
        from sklearn.neighbors import KNeighborsTransformer
        emb = RNG.normal(0, 1, size=(25, 64)).astype(np.float32)
        knn = KNeighborsTransformer(mode="distance", metric="cosine",
                                    n_neighbors=len(emb) - 1)
        dist = knn.fit_transform(emb)
        golden = (np.asarray(dist.sum(axis=1)).flatten())
        golden = (golden - golden.min()) / (golden.max() - golden.min())
        got = S.influence_scores(emb)
        np.testing.assert_allclose(got, golden, rtol=1e-3, atol=1e-5)


class TestRanking:
    def test_stable_descending_then_id_sort(self):
        ids = [4, 7, 9, 12, 30]
        scores = np.array([0.5, 0.9, 0.5, 0.1, 0.9])
        # reference: sorted by score desc (stable), slice, then sorted by id
        golden = sorted([i for i, _ in sorted(
            zip(ids, scores), key=lambda x: x[1], reverse=True)][:3])
        assert S.rank_candidates(ids, scores, top_k=3) == golden

    def test_fuse_thc_wpu_const(self):
        thc = np.array([1.0, 3.0, 2.0])
        wpu = np.array([0.2, 0.1, 0.4])
        t = (thc - 1) / 2
        w = (wpu - 0.1) / 0.3
        u = t + w
        golden = (u - u.min()) / (u.max() - u.min())
        np.testing.assert_allclose(S.fuse_thc_wpu(thc, wpu, 0.3), golden)


class TestFilters:
    def test_kmeans_filter_returns_distinct_members(self):
        emb = RNG.normal(0, 1, size=(40, 16))
        cands = list(range(40))
        q = S.kmeans_filter(emb, cands, 6)
        assert len(q) == 6 and len(set(q)) == 6
        assert all(c in cands for c in q)

    def test_weighted_kmeans_dedupes(self):
        emb = np.vstack([RNG.normal(0, 1, size=(10, 8))] * 2)  # duplicates
        cands = list(range(20))
        w = np.ones(20)
        q = S.kmeans_filter(emb, cands, 5, weight=w, dedupe=True)
        assert len(q) == 5

    def test_random_filter_without_replacement(self):
        rng = np.random.RandomState(166)
        q = S.random_filter(list(range(20)), 8, rng)
        assert len(q) == 8 and len(set(q)) == 8

    def test_diversity_filter_ascending(self):
        emb = RNG.normal(0, 1, size=(15, 8))
        q = S.diversity_filter(emb, list(range(15)), 4)
        assert len(q) == 4


class TestIndexCollection:
    def test_update_difference(self):
        ic = IndexCollection(range(5))
        ic.difference_update([1, 3])
        assert ic.index == [0, 2, 4]
        ic.update([1, 1, 9])
        assert ic.index == [0, 2, 4, 1, 9]
        assert 9 in ic and 3 not in ic


class TestCoresetBucketing:
    def test_padded_pool_never_picked(self):
        """Regression: bucketed padding rows must not win the argmax even
        when 0 * (-inf) NaNs are possible (all-zero uncertainty, mOKS=0)."""
        emb = RNG.normal(0, 1, size=(10, 16)).astype(np.float32)
        unc = np.zeros(10)
        picks = S.coreset_selection(emb, unc, [], 5, 0.01, 0.0,
                                    mode="dynamic")
        assert all(0 <= p < 10 for p in picks)
        assert len(set(picks)) == 5

    def test_bucketed_matches_reference_with_negative_unc(self):
        emb = RNG.normal(0, 1, size=(23, 8)).astype(np.float32)
        unc = -RNG.uniform(1, 2, size=23)  # negative scores (HP-style)
        golden = ref_coreset(emb, unc.copy(), [2, 5], 7, 0.5, 0.4, "dynamic")
        got = S.coreset_selection(emb, unc.copy(), [2, 5], 7, 0.5, 0.4,
                                  mode="dynamic")
        assert got == golden
