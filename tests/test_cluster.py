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


def _poisson_counts(seed=11, S=8, n_prof=40, reps=30):
    rng = np.random.default_rng(seed)
    prof = rng.gamma(2.0, 20.0, size=(n_prof, S))
    rows = rng.integers(0, n_prof, size=n_prof * reps)
    counts = np.minimum(rng.poisson(prof[rows]), 65535).astype(np.uint16).T
    v = (np.log(np.maximum(counts, 1)).sum(axis=1) / counts.shape[1]).astype(
        np.float32)
    return counts, v


def test_fused_session_matches_chunked_path_exactly_pre_compaction():
    """Up to the first capacity compaction the fused session and the
    transform + engine.cluster composition are bit-identical (same rng
    stream, same merge dynamics, same layout)."""
    import jax.numpy as jnp

    from kmerlsh_tpu.ops import transform

    counts, v = _poisson_counts()
    schedule = (0.95 - 0.01 * np.arange(engine.HEAD_ITERS)).astype(np.float32)

    c_f, s_f, m_f = engine.cluster_counts(counts, v, schedule, seed=3)
    jvalues, keep = transform.abundance_transform(counts, v)
    c_c, s_c, m_c = engine.cluster(
        jvalues, keep.astype(jnp.int32), thresholds=schedule, seed=3,
        init_rounds=16)

    assert s_f.tolist() == s_c.tolist()
    assert all(np.array_equal(a, b) for a, b in zip(m_f, m_c))
    np.testing.assert_allclose(c_f, c_c, atol=1e-5)


def test_fused_session_statistically_matches_chunked_path():
    """Across capacity compactions the paths stay statistically identical
    (same cluster count, same size multiset); exact member routing may
    differ because chain centroids are f32 prefix-sum differences whose low
    bits depend on array layout — both paths are individually seeded-
    deterministic, which is strictly stronger than the reference (its runs
    don't even match themselves, hash/lshash.cc:6-7)."""
    import jax.numpy as jnp

    from kmerlsh_tpu.ops import transform

    counts, v = _poisson_counts()
    iters = 12
    sim_step = (0.95 - 0.8) / iters
    schedule = np.concatenate(
        [[0.95], 0.95 - sim_step * np.arange(iters)]).astype(np.float32)

    c_f, s_f, m_f = engine.cluster_counts(counts, v, schedule, seed=3)
    jvalues, keep = transform.abundance_transform(counts, v)
    c_c, s_c, m_c = engine.cluster(
        jvalues, keep.astype(jnp.int32), thresholds=schedule, seed=3,
        init_rounds=16)

    assert len(m_f) == len(m_c)
    assert sorted(s_f.tolist()) == sorted(s_c.tolist())
    # all rows covered exactly once by each
    assert sorted(np.concatenate(m_f).tolist()) == \
        sorted(np.concatenate(m_c).tolist())


def test_cluster_counts_deterministic():
    counts, v = _poisson_counts(seed=5)
    schedule = (0.95 - 0.012 * np.arange(10)).astype(np.float32)
    r1 = engine.cluster_counts(counts, v, schedule, seed=7)
    r2 = engine.cluster_counts(counts, v, schedule, seed=7)
    assert np.array_equal(r1[0], r2[0])
    assert r1[1].tolist() == r2[1].tolist()
    assert all(np.array_equal(a, b) for a, b in zip(r1[2], r2[2]))


def test_fused_session_filters_low_count_rows():
    """Rows failing the Σcount > 0.1·S filter (ioMatrix.cc:381) never
    appear in any cluster."""
    S = 10
    counts = np.zeros((S, 6), np.uint16)
    counts[:, 0] = 50
    counts[:, 1] = 50
    counts[0, 2] = 1   # total 1 ≤ 0.1*10 → dropped
    counts[:, 3] = 30
    v = np.zeros(S, np.float32)
    schedule = np.full(4, 0.5, np.float32)
    _, sizes, members = engine.cluster_counts(counts, v, schedule, seed=0)
    covered = np.concatenate(members) if members else np.empty(0)
    assert 2 not in covered
    assert 4 not in covered and 5 not in covered
    assert int(sizes.sum()) == 3  # rows 0,1,3 survive
