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
  * **dynamic cluster count** — static-shape state with validity masks; the
    active hyperplane count h = ⌊log2 n_alive⌋ is computed *in-graph* so
    whole chunks of iterations run as one ``lax.scan`` without host
    round-trips; the host compacts on device and halves capacity when
    occupancy drops.

Host↔device traffic per chunk is one int32[M] ``merged_into`` array (each
slot dies at most once, so merges compose into a single map); centroids and
sizes never leave the device until the final compacted result. This matters
doubly on remote-tunneled TPUs where PCIe-class transfers are the
bottleneck.

Cluster membership is tracked on host via a parent forest over input rows —
id lists never exist on device.

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

DEFAULT_CHUNK = 8   # iterations fused per program at large capacities
SMALL_CAP = 1 << 16
SMALL_CHUNK = 32    # at small capacities, fuse more: dispatch latency
                    # dominates over the (tiny) per-iteration compute


def pairing_merge(
    values: jax.Array,   # f32 [M, S]
    sizes: jax.Array,    # i32 [M]  (0 = dead slot)
    keys: jax.Array,     # i32 [M] bucket keys (BIG_KEY for dead slots)
    proj: jax.Array,     # f32 [M] secondary ordering projection
    threshold: jax.Array,  # f32 scalar: cosine-similarity threshold
    rounds: int,
    merged_into: jax.Array | None = None,  # i32 [M] accumulator (-1 = alive)
    h: jax.Array | None = None,  # i32 scalar: bits used by ``keys``
    cur_slot: jax.Array | None = None,  # i32 [M] position → stable slot id
    unsort: bool = True,
):
    """R vectorized pairing-merge rounds over key segments (traceable core,
    shared by the single-chip and shard_map paths).

    With ``unsort=True`` (default) arrays come back in input slot order and
    ``merged_into[slot]`` names the slot that absorbed ``slot`` (-1 while
    alive). With ``unsort=False`` arrays stay in sorted position order and
    a 4th output ``cur_slot`` (position → stable slot id) is returned
    instead of paying an inverse-permutation sort — the chunked scan
    threads it through and the host unpermutes once per chunk.

    Cost profile (deliberate): ONE argsort per call; per round only
    cumsum/cummax/cummin scans, gathers, and elementwise math. No scatters
    (XLA:TPU lowers them poorly), no per-round sorts, no associative_scan
    pairs.
    """
    m = values.shape[0]
    big = jnp.int32(BIG_KEY)
    if merged_into is None:
        merged_into = jnp.full((m,), -1, jnp.int32)
    if cur_slot is None:
        cur_slot = jnp.arange(m, dtype=jnp.int32)

    if h is None:
        order = jnp.lexsort((proj, keys))
    else:
        # fuse (bucket key, quantized projection) into ONE int32 sort key:
        # a single sort is ~2× cheaper on TPU than a variadic two-key sort
        free = jnp.clip(30 - h, 0, 29)
        levels = jnp.left_shift(jnp.int32(1), free)
        pmin = jnp.min(proj)
        span = jnp.maximum(jnp.max(proj) - pmin, 1e-20)
        q = jnp.clip(
            ((proj - pmin) / span * levels.astype(jnp.float32)).astype(
                jnp.int32), 0, levels - 1)
        combined = jnp.where(
            keys == big, jnp.int32(2**31 - 1),
            jnp.left_shift(keys, free) | q)
        order = jnp.argsort(combined, stable=True).astype(jnp.int32)
    skey = keys[order]
    sval = values[order]
    ssize = sizes[order]
    scs = cur_slot[order]
    smi = merged_into[order]

    starts = segment.segment_starts(skey)
    valid_seg = skey != big
    seg_id = jnp.cumsum(starts.astype(jnp.int32))
    pos = jnp.arange(m, dtype=jnp.int32)
    # position of each element's segment start (cummax; starts[0] is True)
    seg_pos = jax.lax.cummax(jnp.where(starts, pos, jnp.int32(0)))

    for r in range(rounds):
        alive = (ssize > 0) & valid_seg
        a = alive.astype(jnp.int32)
        alive_before = jnp.cumsum(a) - a  # alive strictly before position
        # rank among alive within segment (valid where alive)
        rank = alive_before - alive_before[seg_pos]

        # nearest alive neighbors by position: within a segment, position
        # order among alive IS rank order, so these are the rank±1 partners
        nxt = jax.lax.cummin(jnp.where(alive, pos, jnp.int32(m)),
                             reverse=True)
        next_after = jnp.concatenate(
            [nxt[1:], jnp.full((1,), m, jnp.int32)])
        prv = jax.lax.cummax(jnp.where(alive, pos, jnp.int32(-1)))
        prev_before = jnp.concatenate(
            [jnp.full((1,), -1, jnp.int32), prv[:-1]])

        ph = r % 2
        role_left = alive & (rank >= ph) & ((rank - ph) % 2 == 0)
        role_right = alive & (rank >= ph + 1) & ((rank - ph) % 2 == 1)

        partner = jnp.where(role_left, next_after, prev_before)
        pc = jnp.clip(partner, 0, m - 1)
        partner_ok = (
            (role_left | role_right)
            & (partner >= 0) & (partner < m)
            & (seg_id[pc] == seg_id)
        )
        partner = jnp.where(partner_ok, pc, pos)

        # each element gathers its own partner; sims are computed on both
        # sides with identical reduction order, so left/right agree bitwise
        pv = sval[partner]
        ps = ssize[partner]
        dot = jnp.sum(sval * pv, axis=1)
        nn = jnp.sqrt(jnp.sum(sval * sval, axis=1) * jnp.sum(pv * pv, axis=1))
        sim = dot / jnp.where(nn > 0, nn, 1.0)
        merge = partner_ok & (sim >= threshold)

        win = merge & role_left    # absorbs its partner
        lose = merge & role_right  # dies into its partner

        tot = (ssize + ps).astype(jnp.float32)
        sval = jnp.where(
            win[:, None],
            (sval * ssize[:, None].astype(jnp.float32)
             + pv * ps[:, None].astype(jnp.float32))
            / jnp.where(win, tot, 1.0)[:, None],
            sval,
        )
        ssize = jnp.where(win, ssize + ps, ssize)
        ssize = jnp.where(lose, 0, ssize)
        smi = jnp.where(lose, scs[partner], smi)

    if not unsort:
        return sval, ssize, smi, scs
    inv = jnp.argsort(order).astype(jnp.int32)
    return sval[inv], ssize[inv], smi[inv]


def chain_collapse(
    values: jax.Array,   # f32 [M, S]
    sizes: jax.Array,    # i32 [M]  (0 = dead slot)
    keys: jax.Array,     # i32 [M] bucket keys (BIG_KEY for dead slots)
    proj: jax.Array,     # f32 [M] secondary ordering projection
    threshold: jax.Array,
    merged_into: jax.Array | None = None,
    cur_slot: jax.Array | None = None,
    h: jax.Array | None = None,
):
    """Single-pass full bucket collapse: consecutive sorted elements whose
    neighbor cosine ≥ threshold chain together; each chain collapses to its
    head with the exact size-weighted mean (computed as cumulative-sum
    differences — weights are integer-exact, value sums are one f32 prefix
    pass). This is the TPU analog of the reference's one greedy sweep over
    a bucket (p_cluster, cluster.cc:56-87): O(1) passes instead of O(b)
    rounds, used for the deep init iteration where buckets are rawest.

    Same output contract as ``pairing_merge(unsort=False)``.
    """
    m = values.shape[0]
    big = jnp.int32(BIG_KEY)
    if merged_into is None:
        merged_into = jnp.full((m,), -1, jnp.int32)
    if cur_slot is None:
        cur_slot = jnp.arange(m, dtype=jnp.int32)

    free = jnp.clip(30 - h, 0, 29)
    levels = jnp.left_shift(jnp.int32(1), free)
    pmin = jnp.min(proj)
    span = jnp.maximum(jnp.max(proj) - pmin, 1e-20)
    q = jnp.clip(((proj - pmin) / span * levels.astype(jnp.float32))
                 .astype(jnp.int32), 0, levels - 1)
    combined = jnp.where(keys == big, jnp.int32(2**31 - 1),
                         jnp.left_shift(keys, free) | q)
    order = jnp.argsort(combined, stable=True).astype(jnp.int32)

    skey = keys[order]
    sval = values[order]
    ssize = sizes[order]
    scs = cur_slot[order]
    smi = merged_into[order]

    starts = segment.segment_starts(skey)
    alive = (ssize > 0) & (skey != big)
    pos = jnp.arange(m, dtype=jnp.int32)

    # neighbor similarity with the previous position (all alive elements of
    # a segment are contiguous: dead slots all carry BIG keys)
    prev_v = jnp.concatenate([sval[:1], sval[:-1]])
    dot = jnp.sum(sval * prev_v, axis=1)
    nn = jnp.sqrt(jnp.sum(sval * sval, axis=1)
                  * jnp.sum(prev_v * prev_v, axis=1))
    sim = dot / jnp.where(nn > 0, nn, 1.0)
    prev_alive = jnp.concatenate([jnp.zeros(1, bool), alive[:-1]])
    link = alive & prev_alive & (~starts) & (sim >= threshold)
    head = alive & ~link

    # chain span sums via prefix differences (weights int-exact)
    w = ssize
    w_cum = jnp.cumsum(w)
    wv_cum = jnp.cumsum(sval * w[:, None].astype(jnp.float32), axis=0)
    head_pos = jax.lax.cummax(jnp.where(head, pos, jnp.int32(0)))
    nx = jax.lax.cummin(jnp.where(head, pos, jnp.int32(m)), reverse=True)
    next_head = jnp.concatenate([nx[1:], jnp.full((1,), m, jnp.int32)])
    end = jnp.clip(next_head - 1, 0, m - 1)

    w_lo = jnp.where(pos > 0, w_cum[jnp.clip(pos - 1, 0, m - 1)], 0)
    W = w_cum[end] - w_lo
    wv_lo = jnp.where((pos > 0)[:, None],
                      wv_cum[jnp.clip(pos - 1, 0, m - 1)], 0.0)
    centroid = (wv_cum[end] - wv_lo) / jnp.maximum(
        W[:, None].astype(jnp.float32), 1.0)

    new_val = jnp.where(head[:, None], centroid, sval)
    new_size = jnp.where(head, W, jnp.where(alive, 0, ssize))
    loser = alive & link
    new_mi = jnp.where(loser, scs[head_pos], smi)
    return new_val, new_size, new_mi, scs


def _active_h(sizes):
    n_alive = jnp.maximum(jnp.sum((sizes > 0).astype(jnp.int32)), 2)
    return jnp.clip(
        jnp.floor(jnp.log2(n_alive.astype(jnp.float32))).astype(jnp.int32),
        1, lsh.H_MAX,
    )


def _one_iteration(values, sizes, rng, threshold, rounds, merged_into,
                   cur_slot):
    """One LSH iteration with h = ⌊log2 n_alive⌋ computed in-graph; state
    stays in sorted position order (cur_slot tracks stable slot ids)."""
    h = _active_h(sizes)
    hyper = lsh.draw_hyperplanes(rng, values.shape[1])
    keys, proj = lsh.signatures(values, hyper, h)
    keys = jnp.where(sizes > 0, keys, jnp.int32(BIG_KEY))
    return pairing_merge(values, sizes, keys, proj, threshold, rounds,
                         merged_into, h=h, cur_slot=cur_slot, unsort=False)


@partial(jax.jit, static_argnames=("rounds",), donate_argnums=(0, 1))
def _lsh_merge_iteration(values, sizes, rng, h, threshold, rounds: int = 4):
    """Single-iteration slot-stable entry (compile-check / bench paths;
    ``h`` is accepted for signature stability but recomputed in-graph)."""
    del h
    hh = _active_h(sizes)
    hyper = lsh.draw_hyperplanes(rng, values.shape[1])
    keys, proj = lsh.signatures(values, hyper, hh)
    keys = jnp.where(sizes > 0, keys, jnp.int32(BIG_KEY))
    return pairing_merge(values, sizes, keys, proj, threshold, rounds, h=hh)


@partial(jax.jit, donate_argnums=(0, 1))
def _lsh_chain_iteration(values, sizes, rng, threshold):
    """One deep iteration: hash then single-pass chain collapse."""
    h = _active_h(sizes)
    hyper = lsh.draw_hyperplanes(rng, values.shape[1])
    keys, proj = lsh.signatures(values, hyper, h)
    keys = jnp.where(sizes > 0, keys, jnp.int32(BIG_KEY))
    values, sizes, mi, cs = chain_collapse(
        values, sizes, keys, proj, threshold, h=h)
    n_alive = jnp.sum((sizes > 0).astype(jnp.int32))
    return values, sizes, mi, cs, n_alive


@partial(jax.jit, static_argnames=("rounds",), donate_argnums=(0, 1))
def _lsh_cluster_chunk(values, sizes, base_rng, iter_offset, thresholds,
                       rounds: int = 4):
    """Run ``len(thresholds)`` LSH iterations as one ``lax.scan`` program.

    State lives in permuted position order across iterations (no inverse
    sorts); ``cur_slot`` maps final positions back to the chunk-entry slot
    ids. Returns (values, sizes, merged_into, cur_slot, n_alive):
    ``merged_into`` is position-aligned, its values are chunk-entry slot
    ids of the absorbing cluster (one composed map — each slot dies at
    most once per chunk)."""
    m = values.shape[0]

    def body(carry, x):
        values, sizes, mi, cs = carry
        thr, it = x
        rng = jax.random.fold_in(base_rng, it)
        values, sizes, mi, cs = _one_iteration(
            values, sizes, rng, thr, rounds, mi, cs)
        return (values, sizes, mi, cs), ()

    its = iter_offset + jnp.arange(len(thresholds), dtype=jnp.int32)
    (values, sizes, mi, cs), _ = jax.lax.scan(
        body,
        (values, sizes, jnp.full((m,), -1, jnp.int32),
         jnp.arange(m, dtype=jnp.int32)),
        (thresholds, its))
    n_alive = jnp.sum((sizes > 0).astype(jnp.int32))
    return values, sizes, mi, cs, n_alive


@jax.jit
def _compact_order(sizes):
    """Stable permutation placing alive slots first."""
    return jnp.argsort(sizes == 0, stable=True).astype(jnp.int32)


@partial(jax.jit, static_argnames=("new_cap",), donate_argnums=(0, 1))
def _gather_slice(values, sizes, order, new_cap: int):
    return values[order][:new_cap], sizes[order][:new_cap]


class MergeForest:
    """Host-side membership forest over input rows, fed by batched merge
    events. A loser slot dies the moment it merges and never appears again,
    so ``parent[loser] = winner`` needs no find — event application is one
    vectorized scatter per chunk."""

    def __init__(self, n: int):
        self.parent = np.arange(n, dtype=np.int64)

    def apply_events(self, winners: np.ndarray, losers: np.ndarray) -> int:
        """winners/losers: row indices (-1 winner = padding). Returns #merges."""
        mask = winners >= 0
        self.parent[losers[mask]] = winners[mask]
        return int(mask.sum())

    def resolve(self) -> np.ndarray:
        """Root row of every input row (vectorized log-depth pointer jump)."""
        r = self.parent
        while True:
            nr = r[r]
            if np.array_equal(nr, r):
                return r
            r = nr

    def groups(self) -> tuple[np.ndarray, dict[int, np.ndarray]]:
        """Returns (roots per row, {root: sorted member rows})."""
        roots = self.resolve()
        order = np.argsort(roots, kind="stable")
        sr = roots[order]
        starts = np.flatnonzero(np.r_[True, sr[1:] != sr[:-1]])
        groups = np.split(order, starts[1:])
        return roots, {int(sr[s]): g for s, g in zip(starts, groups)}


def _pad_capacity(n: int) -> int:
    """Round up to a power of two (min 4096) so only log-many distinct
    programs ever compile — on remote-compile TPU setups each distinct
    shape costs a full XLA compile."""
    return max(4096, 1 << math.ceil(math.log2(max(n, 1))))


def cluster(
    values,
    sizes=None,
    min_similarity: float = 0.8,
    iterations: int = 100,
    seed: int = 0,
    rounds: int = 4,
    chunk: int = DEFAULT_CHUNK,
    compact_below: float = 0.5,
    verbose: bool = False,
    thresholds: np.ndarray | None = None,
    init_rounds: int | None = None,
) -> tuple[np.ndarray, np.ndarray, list[np.ndarray]]:
    """Cluster rows of ``values`` [N, S] with the annealed-threshold LSH loop
    (0.95 → min_similarity over ``iterations``, cluster.cc:190-192,330).

    ``values``/``sizes`` may be NumPy or device arrays (device arrays avoid
    any host transfer of the matrix; rows with size 0 are pre-filtered
    slots). Returns (centroids [K, S], sizes [K], members: per-cluster
    sorted arrays of input row indices), ordered by smallest member index.
    """
    on_device = isinstance(values, jax.Array)
    if not on_device:
        values = np.asarray(values, dtype=np.float32)
    n, s = values.shape
    if n == 0:
        return np.zeros((0, s), np.float32), np.zeros(0, np.int64), []

    cap = _pad_capacity(n)
    if on_device:
        jvals = jnp.pad(values.astype(jnp.float32), ((0, cap - n), (0, 0)))
        if sizes is None:
            jsizes = jnp.pad(jnp.ones(n, jnp.int32), (0, cap - n))
        else:
            jsizes = jnp.pad(jnp.asarray(sizes, jnp.int32), (0, cap - n))
    else:
        host_vals = np.zeros((cap, s), np.float32)
        host_vals[:n] = values
        host_sizes = np.zeros(cap, np.int32)
        host_sizes[:n] = (np.asarray(sizes, np.int32) if sizes is not None
                          else np.ones(n, np.int32))
        jvals = jnp.asarray(host_vals)
        jsizes = jnp.asarray(host_sizes)

    forest = MergeForest(n)
    slot_row = np.full(cap, -1, np.int64)  # device slot -> input row
    slot_row[:n] = np.arange(n)
    root_rng = jax.random.PRNGKey(seed)

    if thresholds is None:
        sim_step = (0.95 - min_similarity) / iterations
        thresholds = (0.95 - sim_step * np.arange(iterations)).astype(
            np.float32)
    else:
        thresholds = np.asarray(thresholds, np.float32)
        iterations = len(thresholds)

    it = 0
    n_alive = n
    while it < iterations:
        if init_rounds is not None and it == 0:
            # first iteration gets the single-pass chain collapse: the TPU
            # analog of the reference's full greedy bucket sweep on raw rows
            jvals, jsizes, mi, cs, na = _lsh_chain_iteration(
                jvals, jsizes, jax.random.fold_in(root_rng, 0),
                jnp.float32(thresholds[0]))
            mi, cs = np.asarray(mi), np.asarray(cs)
            losers_pos = np.flatnonzero(mi >= 0)
            forest.apply_events(slot_row[mi[losers_pos]],
                                slot_row[cs[losers_pos]])
            slot_row = slot_row[cs]
            n_alive = int(na)
            it = 1
            if verbose:
                print(f"[tpu] iter 1 (deep): {n_alive} clusters")
            new_cap = _pad_capacity(n_alive)
            if (cap > SMALL_CAP and n_alive < compact_below * cap
                    and new_cap < cap):
                order = _compact_order(jsizes)
                perm = np.asarray(order)
                jvals, jsizes = _gather_slice(jvals, jsizes, order, new_cap)
                slot_row = slot_row[perm][:new_cap]
                cap = new_cap
            continue
        # pad to a fixed chunk length with an unreachable threshold (>1 ⇒
        # no merges): at most a few compiled programs per capacity (C=1 for
        # single-iteration phases, C=chunk / C=SMALL_CHUNK otherwise), and
        # no wasted no-op hash+sort passes when only one iteration remains
        c_cap = SMALL_CHUNK if cap <= SMALL_CAP else chunk
        c = min(c_cap, iterations - it)
        c_prog = 1 if c == 1 else c_cap
        thr = np.full(c_prog, 9.0, np.float32)
        thr[:c] = thresholds[it : it + c]
        jvals, jsizes, mi, cs, na = _lsh_cluster_chunk(
            jvals, jsizes, root_rng, jnp.int32(it), jnp.asarray(thr), rounds)
        mi = np.asarray(mi)
        cs = np.asarray(cs)
        losers_pos = np.flatnonzero(mi >= 0)
        # mi values are chunk-entry slot ids; positions map via cur_slot
        forest.apply_events(slot_row[mi[losers_pos]],
                            slot_row[cs[losers_pos]])
        slot_row = slot_row[cs]  # re-align host map to permuted positions
        n_alive = int(na)
        it += c
        if verbose:
            print(f"[tpu] iter {it}: {n_alive} clusters, "
                  f"threshold {thresholds[min(it, iterations - 1)]:.4f}")

        # compact only while capacities are large: shrinking the sort from
        # 2^20 to 2^16 pays for itself; below SMALL_CAP the extra dispatch
        # round trips cost more than the smaller sorts save
        new_cap = _pad_capacity(n_alive)
        if (it < iterations and cap > SMALL_CAP
                and n_alive < compact_below * cap and new_cap < cap):
            order = _compact_order(jsizes)
            perm = np.asarray(order)
            jvals, jsizes = _gather_slice(jvals, jsizes, order, new_cap)
            slot_row = slot_row[perm][:new_cap]
            cap = new_cap

    # final on-device compaction, then pull only the alive prefix
    order = _compact_order(jsizes)
    perm = np.asarray(order)
    final_cap = _pad_capacity(n_alive)
    jvals, jsizes = _gather_slice(jvals, jsizes, order, final_cap)
    slot_row = slot_row[perm][:final_cap]
    final_sizes = np.asarray(jsizes)
    final_vals = np.asarray(jvals)
    alive_idx = np.nonzero(final_sizes > 0)[0]

    roots, members_of_root = forest.groups()
    out = []
    for si in alive_idx:
        g = members_of_root[int(roots[slot_row[si]])]
        out.append((int(g[0]), final_vals[si], final_sizes[si], g))
    out.sort(key=lambda t: t[0])
    centroids = np.stack([o[1] for o in out]) if out else np.zeros((0, s), np.float32)
    out_sizes = np.asarray([o[2] for o in out], np.int64)
    members = [o[3] for o in out]
    return centroids, out_sizes, members
