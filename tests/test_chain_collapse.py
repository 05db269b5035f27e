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
