"""Clustering engine tests: both engines must recover planted clusters and
agree with each other; merge algebra must match the reference's weighted
mean; runs must be deterministic under a fixed seed."""

import numpy as np
import pytest

from kmerlsh_tpu.cluster import engine, greedy


def planted(rng, n_clusters=12, members=25, S=16, noise=0.01):
    """Well-separated random centroids with tight noise — every engine must
    recover the exact partition."""
    centers = rng.normal(size=(n_clusters, S)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows, labels = [], []
    for c in range(n_clusters):
        pts = centers[c][None, :] + noise * rng.normal(size=(members, S))
        rows.append(pts.astype(np.float32))
        labels += [c] * members
    rows = np.concatenate(rows)
    perm = rng.permutation(len(rows))
    return rows[perm], np.asarray(labels)[perm]


def partition_of(members, n):
    lab = np.full(n, -1)
    for c, ids in enumerate(members):
        lab[np.asarray(ids, int)] = c
    assert (lab >= 0).all()
    return lab


def same_partition(a, b):
    # bijection between label sets
    pairs = set(zip(a.tolist(), b.tolist()))
    return len(pairs) == len(set(a.tolist())) == len(set(b.tolist()))


@pytest.mark.parametrize("eng", ["greedy", "tpu"])
def test_planted_recovery(eng):
    rng = np.random.default_rng(0)
    X, labels = planted(rng)
    fn = greedy.cluster if eng == "greedy" else engine.cluster
    cents, sizes, members = fn(X, min_similarity=0.90, iterations=30, seed=1)
    assert len(members) == 12
    assert sorted(sizes.tolist()) == [25] * 12
    assert same_partition(partition_of(members, len(X)), labels)
    # centroid of a pure cluster ≈ member mean
    for c, ids in enumerate(members):
        np.testing.assert_allclose(cents[c], X[np.asarray(ids, int)].mean(0),
                                   atol=1e-4)


def test_tpu_engine_deterministic():
    rng = np.random.default_rng(3)
    X, _ = planted(rng, n_clusters=8, members=10)
    r1 = engine.cluster(X, min_similarity=0.85, iterations=15, seed=7)
    r2 = engine.cluster(X, min_similarity=0.85, iterations=15, seed=7)
    assert np.array_equal(r1[0], r2[0])
    assert all(np.array_equal(a, b) for a, b in zip(r1[2], r2[2]))


def test_engines_agree_on_separated_data():
    rng = np.random.default_rng(5)
    X, labels = planted(rng, n_clusters=6, members=40, S=12, noise=0.005)
    _, s1, m1 = greedy.cluster(X, min_similarity=0.92, iterations=25, seed=2)
    _, s2, m2 = engine.cluster(X, min_similarity=0.92, iterations=25, seed=2)
    assert sorted(s1.tolist()) == sorted(s2.tolist()) == [40] * 6
    assert same_partition(partition_of(m1, len(X)), partition_of(m2, len(X)))


def test_weighted_sizes_as_input():
    # rows pre-weighted (as in the out-of-core merge rounds): merged centroid
    # must be the size-weighted mean (funcAB.cc:62-67)
    X = np.array([[1.0, 0.0], [0.999, 0.01]], np.float32)
    w = np.array([3, 1], np.int32)
    for fn in (greedy.cluster, engine.cluster):
        cents, sizes, members = fn(X, sizes=w, min_similarity=0.9,
                                   iterations=5, seed=0)
        assert len(members) == 1 and sizes[0] == 4
        want = (3 * X[0] + 1 * X[1]) / 4
        np.testing.assert_allclose(cents[0], want, atol=1e-6)


def test_dissimilar_rows_never_merge():
    X = np.eye(8, dtype=np.float32)  # orthogonal rows, cosine 0
    for fn in (greedy.cluster, engine.cluster):
        _, sizes, members = fn(X, min_similarity=0.8, iterations=20, seed=0)
        assert len(members) == 8
        assert sizes.tolist() == [1] * 8


def test_anneal_threshold_progression():
    # two groups at cosine ~0.93: must merge only once threshold anneals
    # below 0.93 — i.e. with min_sim=0.95-ish high nothing merges
    a = np.array([1.0, 0.0], np.float32)
    th = 0.90
    b = np.array([np.cos(np.arccos(th)), np.sin(np.arccos(th))], np.float32)
    X = np.stack([a, a, b, b])
    # min_similarity=0.94 → threshold never reaches 0.90: expect 2 clusters
    _, _, m_hi = engine.cluster(X, min_similarity=0.94, iterations=10, seed=0)
    assert len(m_hi) == 2
    # min_similarity=0.80 → threshold passes 0.90: expect 1 cluster
    _, _, m_lo = engine.cluster(X, min_similarity=0.80, iterations=10, seed=0)
    assert len(m_lo) == 1


def test_single_row_and_empty():
    one = np.ones((1, 4), np.float32)
    for fn in (greedy.cluster, engine.cluster):
        cents, sizes, members = fn(one, min_similarity=0.8, iterations=3, seed=0)
        assert len(members) == 1 and sizes[0] == 1
    cents, sizes, members = engine.cluster(np.zeros((0, 4), np.float32))
    assert len(members) == 0


def test_large_duplicate_bucket_collapses_fast():
    # 2000 identical rows: pairing-merge must collapse them within few
    # iterations (log-depth), the TPU answer to nestedCluster
    X = np.tile(np.array([[0.3, -1.2, 0.5, 2.0]], np.float32), (2000, 1))
    X += 1e-4 * np.random.default_rng(0).normal(size=X.shape).astype(np.float32)
    _, sizes, members = engine.cluster(X, min_similarity=0.9, iterations=25,
                                       seed=0)
    assert len(members) == 1
    assert sizes[0] == 2000
