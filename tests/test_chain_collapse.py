"""Unit semantics of the single-pass chain collapse."""

import numpy as np
import jax
import jax.numpy as jnp

from kmerlsh_tpu.cluster import engine


def run_chain(values, sizes, keys, proj, threshold, h=5):
    # the engine's native layout is sample-major [S, M]
    vt, s, mi, cs = engine.chain_collapse(
        jnp.asarray(values).T, jnp.asarray(sizes, jnp.int32),
        jnp.asarray(keys, jnp.int32), jnp.asarray(proj, jnp.float32),
        jnp.float32(threshold), h=jnp.int32(h))
    return map(np.asarray, (vt.T, s, mi, cs))


def test_chain_merges_full_bucket_exactly():
    base = np.array([1.0, 2.0, -1.0, 0.5], np.float32)
    n = 64
    rng = np.random.default_rng(0)
    V = np.tile(base, (n, 1)) + 1e-5 * rng.normal(size=(n, 4)).astype(np.float32)
    sizes = rng.integers(1, 5, size=n).astype(np.int32)
    keys = np.zeros(n, np.int32)        # one bucket
    proj = rng.normal(size=n).astype(np.float32)
    v, s, mi, cs = run_chain(V, sizes, keys, proj, 0.9)
    alive = s > 0
    assert alive.sum() == 1
    W = int(sizes.sum())
    assert s[alive][0] == W
    want = (V * sizes[:, None]).sum(0) / W
    np.testing.assert_allclose(v[alive][0], want, rtol=1e-4, atol=1e-5)
    # every loser points at the head slot
    head_slot = cs[np.nonzero(alive)[0][0]]
    losers = mi >= 0
    assert losers.sum() == n - 1
    assert (mi[losers] == head_slot).all()


def test_chain_respects_buckets_and_threshold():
    a = np.array([1.0, 0.0], np.float32)
    b = np.array([0.0, 1.0], np.float32)  # orthogonal to a
    V = np.stack([a, a, b, b, a, a])
    keys = np.array([0, 0, 0, 0, 7, 7], np.int32)  # two buckets
    # proj separates a's from b's in bucket 0 so chains are a,a | b,b
    proj = np.array([0.0, 0.1, 5.0, 5.1, 0.0, 0.1], np.float32)
    sizes = np.ones(6, np.int32)
    v, s, mi, cs = run_chain(V, sizes, keys, proj, 0.9)
    assert (s > 0).sum() == 3  # {a,a}@0, {b,b}@0, {a,a}@7
    assert sorted(s[s > 0].tolist()) == [2, 2, 2]


def test_chain_skips_dead_slots():
    V = np.tile(np.array([1.0, 1.0], np.float32), (8, 1))
    sizes = np.array([1, 0, 1, 1, 0, 1, 1, 1], np.int32)
    keys = np.zeros(8, np.int32)
    keys[sizes == 0] = engine.BIG_KEY
    proj = np.arange(8, dtype=np.float32)
    v, s, mi, cs = run_chain(V, sizes, keys, proj, 0.9)
    assert (s > 0).sum() == 1
    assert s[s > 0][0] == 6  # only the 6 live rows


def test_finalize_grouped_matches_host_grouping():
    """Device-side membership grouping (_finalize_grouped) must reproduce
    the host reference (_group_by_roots) exactly: same cluster order
    (smallest member first), same ascending members, same centroids/sizes,
    dead-rooted rows excluded."""
    import numpy as np
    import jax.numpy as jnp
    from kmerlsh_tpu.cluster import engine

    rng = np.random.default_rng(3)
    cap0, fc, S = 4096, 1024, 5
    n_alive = 300
    # alive slots: random subset; every alive slot roots to itself
    alive_slots = np.sort(rng.choice(cap0 // 2, size=n_alive, replace=False))
    parent = rng.permutation(np.repeat(alive_slots,
                                       -(-cap0 // n_alive))[:cap0])
    parent[alive_slots] = alive_slots
    # some dead self-rooted rows (filtered)
    dead = rng.choice(np.setdiff1d(np.arange(cap0), alive_slots), size=200,
                      replace=False)
    parent[dead] = dead
    # compacted state: alive first
    slots = np.full(fc, 0, np.int32)
    slots[:n_alive] = alive_slots
    slots[n_alive:] = np.setdiff1d(np.arange(cap0), alive_slots)[
        : fc - n_alive]
    sizes = np.zeros(fc, np.int32)
    sizes[:n_alive] = rng.integers(1, 50, size=n_alive)
    vals_t = rng.normal(size=(S, fc)).astype(np.float32)

    buf = np.asarray(engine._finalize_grouped(
        jnp.asarray(vals_t), jnp.asarray(sizes), jnp.asarray(slots),
        jnp.asarray(parent.astype(np.int32)), fc, 4))
    from kmerlsh_tpu.cluster.groups import Groups

    lens = buf[cap0:cap0 + fc][:n_alive].astype(np.int64)
    csizes = buf[cap0 + fc:cap0 + 2 * fc][:n_alive]
    vals = buf[cap0 + 2 * fc:].view(np.float32).reshape(S, fc)[:, :n_alive]
    offs = np.concatenate([[0], np.cumsum(lens)])
    got = Groups(buf[:offs[-1]].astype(np.int64), offs)

    roots = parent
    for _ in range(4):
        roots = roots[roots]
    want_c, want_s, want_m = engine._group_by_roots(
        roots, alive_slots, sizes[:n_alive], vals_t[:, :n_alive])

    assert len(got) == len(want_m) == n_alive
    assert np.array_equal(got.flat, want_m.flat)
    assert np.array_equal(got.offsets, want_m.offsets)
    assert np.array_equal(csizes.astype(np.int64), want_s)
    np.testing.assert_array_equal(vals.T, want_c)


def test_finalize_at_smaller_capacity_than_session():
    """Regression: a session that ends at a capacity larger than the final
    cluster count needs (no compaction ran — e.g. a single-threshold batch
    pass) must finalize correctly; _finalize_grouped slices state to fc."""
    import numpy as np
    from kmerlsh_tpu.cluster import engine

    rng = np.random.default_rng(0)
    n, S, k = 8192, 8, 64
    prof = rng.normal(size=(k, S)).astype(np.float32)
    prof /= np.linalg.norm(prof, axis=1, keepdims=True)
    rows = rng.integers(0, k, size=n)
    counts = np.clip(
        np.rint(np.expm1(4.0 + prof[rows])), 1, 65535).astype(np.uint16)
    cmat = np.ascontiguousarray(counts.T)
    v = np.zeros(S, np.float32)
    cents, sizes, members = engine.cluster_counts(
        cmat, v, np.asarray([0.95], np.float32), seed=0, deep_init=True)
    # survivors far below cap/2 → fc (4096) < session capacity (8192)
    assert len(members) < 4096
    assert members.offsets[-1] == n
    assert sizes.sum() == n
