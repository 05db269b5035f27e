"""TPU-native LSH clustering engine.

The reference's hot loop (function/cluster.cc:181-340) is re-designed for
XLA rather than translated:

  * **signatures** — one [M, S] × [S, 31] matmul on the MXU replaces the
    per-row scalar projection loop (hot loop #1, hash/lshash.cc:44-59);
  * **bucketing** — ``lexsort`` by (key, secondary projection) replaces the
    scatter into 2^h vectors (cluster.cc:15-30); buckets become contiguous
    segments;
  * **within-bucket merging** — the inherently sequential greedy
    ``p_cluster`` (cluster.cc:56-87) is replaced by *pairing-merge rounds*:
    within each segment, alive clusters are ranked and adjacent rank pairs
    (alternating odd/even phase per round) are tested and merged in one
    fully-vectorized step across every bucket at once. Secondary ordering by
    a random projection places similar profiles adjacently, so R rounds
    collapse a b-duplicate bucket in O(log b) rounds instead of O(b²) work.
    Merged centroids are the same size-weighted means (funcAB.cc:49-71) and
    the same annealed cosine threshold gates each merge;
  * **oversized buckets** — need no special case (the reference re-partitions
    buckets > 1e6 once, cluster.cc:286-288): pairing cost is independent of
    bucket size;
  * **dynamic cluster count** — static-shape state with validity masks;
    the host compacts and halves capacity when occupancy drops below 50%.

Cluster membership is tracked on host via a union-find over input rows fed
by per-round (winner, loser) merge events — centroids and sizes live on
device, id lists never do.

Determinism: hyperplanes come from ``jax.random`` keys derived from a seed
(the reference draws from an unseeded ``std::random_device``).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from kmerlsh_tpu.ops import lsh, segment


BIG_KEY = 2**31 - 1  # sentinel: dead slots sort to the end


def pairing_merge(
    values: jax.Array,   # f32 [M, S]
    sizes: jax.Array,    # i32 [M]  (0 = dead slot)
    keys: jax.Array,     # i32 [M] bucket keys (BIG_KEY for dead slots)
    proj: jax.Array,     # f32 [M] secondary ordering projection
    threshold: jax.Array,  # f32 scalar: cosine-similarity threshold
    rounds: int,
):
    """R vectorized pairing-merge rounds over key segments (traceable core,
    shared by the single-chip and shard_map paths).

    Returns (values, sizes, winners i32 [rounds, M], losers i32 [rounds, M])
    where (winners[r, i], losers[r, i]) are slot indices merged in round r
    (-1 entries are padding).
    """
    m = values.shape[0]
    big = jnp.int32(BIG_KEY)

    order = jnp.lexsort((proj, keys))
    skey = keys[order]
    sval = values[order]
    ssize = sizes[order]
    sslot = order.astype(jnp.int32)

    starts = segment.segment_starts(skey)
    valid_seg = skey != big
    seg_id = jnp.cumsum(starts.astype(jnp.int32))

    win_all, lose_all = [], []
    for r in range(rounds):
        alive = (ssize > 0) & valid_seg
        a = alive.astype(jnp.int32)
        g = jnp.cumsum(a) - 1  # global alive rank (dense, segment-contiguous)
        rank = segment.alive_rank_in_segment(alive, starts)

        # position of the alive element with global rank g (scatter-drop dead)
        pos_of_g = jnp.full((m,), m, dtype=jnp.int32)
        pos_of_g = pos_of_g.at[jnp.where(alive, g, m)].set(
            jnp.arange(m, dtype=jnp.int32), mode="drop"
        )

        ph = r % 2
        is_left = alive & (rank >= ph) & ((rank - ph) % 2 == 0)
        partner = pos_of_g[jnp.clip(g + 1, 0, m - 1)]
        partner_ok = (
            is_left
            & (g + 1 < jnp.sum(a))
            & (partner < m)
            & (seg_id[jnp.clip(partner, 0, m - 1)] == seg_id)
        )
        partner = jnp.where(partner_ok, partner, 0)

        pv = sval[partner]
        ps = ssize[partner]
        dot = jnp.sum(sval * pv, axis=1)
        nn = jnp.sqrt(jnp.sum(sval * sval, axis=1) * jnp.sum(pv * pv, axis=1))
        sim = dot / jnp.where(nn > 0, nn, 1.0)
        merge = partner_ok & (sim >= threshold)

        tot = (ssize + ps).astype(jnp.float32)
        wnew = jnp.where(
            merge[:, None],
            (sval * ssize[:, None].astype(jnp.float32) + pv * ps[:, None].astype(jnp.float32))
            / jnp.where(merge, tot, 1.0)[:, None],
            sval,
        )
        # winner (left) absorbs partner; partner dies
        loser_mask = jnp.zeros((m,), bool).at[jnp.where(merge, partner, m)].set(
            True, mode="drop"
        )
        sval = wnew
        ssize = jnp.where(merge, ssize + ps, ssize)
        ssize = jnp.where(loser_mask, 0, ssize)

        win_all.append(jnp.where(merge, sslot, -1))
        lose_all.append(jnp.where(merge, sslot[partner], -1))

    inv = jnp.zeros((m,), jnp.int32).at[order].set(jnp.arange(m, dtype=jnp.int32))
    return (
        sval[inv],
        ssize[inv],
        jnp.stack(win_all),
        jnp.stack(lose_all),
    )


@partial(jax.jit, static_argnames=("rounds",), donate_argnums=(0, 1))
def _lsh_merge_iteration(
    values: jax.Array,   # f32 [M, S]
    sizes: jax.Array,    # i32 [M]
    rng: jax.Array,      # PRNG key
    h: jax.Array,        # i32 scalar: active hyperplanes (⌊log2 n⌋)
    threshold: jax.Array,
    rounds: int = 4,
):
    """One single-chip LSH iteration: hash on the MXU, then pairing merge."""
    hyper = lsh.draw_hyperplanes(rng, values.shape[1])
    keys, proj = lsh.signatures(values, hyper, h)
    keys = jnp.where(sizes > 0, keys, jnp.int32(BIG_KEY))
    return pairing_merge(values, sizes, keys, proj, threshold, rounds)


class UnionFind:
    """Host-side membership forest over input rows."""

    def __init__(self, n: int):
        self.parent = np.arange(n, dtype=np.int64)

    def find(self, x: int) -> int:
        p = self.parent
        root = x
        while p[root] != root:
            root = p[root]
        while p[x] != root:
            p[x], x = root, p[x]
        return root

    def union_into(self, winner: int, loser: int) -> None:
        self.parent[self.find(loser)] = self.find(winner)


def _pad_capacity(n: int) -> int:
    """Round up to limit distinct compiled shapes (multiples of 256, then
    powers of two above 4096)."""
    if n <= 4096:
        return max(256, 256 * math.ceil(n / 256))
    return 1 << math.ceil(math.log2(n))


def cluster(
    values: np.ndarray,
    sizes: np.ndarray | None = None,
    min_similarity: float = 0.8,
    iterations: int = 100,
    seed: int = 0,
    rounds: int = 4,
    compact_below: float = 0.5,
    verbose: bool = False,
) -> tuple[np.ndarray, np.ndarray, list[np.ndarray]]:
    """Cluster rows of ``values`` [N, S] with the annealed-threshold LSH loop
    (0.95 → min_similarity over ``iterations``, cluster.cc:190-192,330).

    Returns (centroids [K, S], sizes [K], members: per-cluster sorted arrays
    of input row indices), ordered by smallest member index.
    """
    values = np.asarray(values, dtype=np.float32)
    n, s = values.shape
    if n == 0:
        return values, np.zeros(0, np.int64), []
    in_sizes = (
        np.asarray(sizes, np.int32) if sizes is not None else np.ones(n, np.int32)
    )

    uf = UnionFind(n)
    cap = _pad_capacity(n)
    dev_vals = np.zeros((cap, s), np.float32)
    dev_vals[:n] = values
    dev_sizes = np.zeros(cap, np.int32)
    dev_sizes[:n] = in_sizes
    slot_row = np.full(cap, -1, np.int64)  # device slot -> representative row
    slot_row[:n] = np.arange(n)

    jvals = jnp.asarray(dev_vals)
    jsizes = jnp.asarray(dev_sizes)
    root = jax.random.PRNGKey(seed)

    max_similarity = 0.95
    sim_step = (max_similarity - min_similarity) / iterations
    threshold = max_similarity
    n_alive = n

    for it in range(iterations):
        h = min(max(int(math.floor(math.log2(max(n_alive, 1)))), 0), lsh.H_MAX)
        rng = jax.random.fold_in(root, it)
        jvals, jsizes, winners, losers = _lsh_merge_iteration(
            jvals, jsizes, rng, jnp.int32(h), jnp.float32(threshold), rounds
        )
        wn = np.asarray(winners).ravel()
        ln = np.asarray(losers).ravel()
        mask = wn >= 0
        for w, l in zip(wn[mask], ln[mask]):
            uf.union_into(slot_row[w], slot_row[l])
        n_alive -= int(mask.sum())

        if verbose:
            print(f"[tpu] iter {it + 1}: {n_alive} clusters, "
                  f"threshold {threshold:.4f}")
        threshold -= sim_step

        # host-side compaction + capacity shrink
        new_cap = _pad_capacity(n_alive)
        if n_alive < compact_below * cap and new_cap < cap:
            hs = np.asarray(jsizes)
            alive_idx = np.nonzero(hs > 0)[0]
            hv = np.asarray(jvals)[alive_idx]
            cap = new_cap
            dev_vals = np.zeros((cap, s), np.float32)
            dev_vals[: len(alive_idx)] = hv
            dev_sizes = np.zeros(cap, np.int32)
            dev_sizes[: len(alive_idx)] = hs[alive_idx]
            new_slot_row = np.full(cap, -1, np.int64)
            new_slot_row[: len(alive_idx)] = slot_row[alive_idx]
            slot_row = new_slot_row
            jvals, jsizes = jnp.asarray(dev_vals), jnp.asarray(dev_sizes)

    final_sizes = np.asarray(jsizes)
    final_vals = np.asarray(jvals)
    alive_idx = np.nonzero(final_sizes > 0)[0]

    # gather members per root
    roots = np.array([uf.find(i) for i in range(n)], dtype=np.int64)
    members_of_root: dict[int, list[int]] = {}
    for row, r in enumerate(roots):
        members_of_root.setdefault(int(r), []).append(row)

    out = []
    for si in alive_idx:
        r = uf.find(slot_row[si])
        out.append((members_of_root[r][0], final_vals[si], final_sizes[si],
                    np.asarray(members_of_root[r], np.int64)))
    out.sort(key=lambda t: t[0])
    centroids = np.stack([o[1] for o in out]) if out else np.zeros((0, s), np.float32)
    out_sizes = np.asarray([o[2] for o in out], np.int64)
    members = [o[3] for o in out]
    return centroids, out_sizes, members
