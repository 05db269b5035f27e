"""Differential-read scoring (mode E's hot loop #3).

Reference semantics (``IOFQ::CheckRead``, io/ioFastQ.cc:5-76):
  * reads with empty sequence are skipped (:21-24);
  * reads shorter than k+10 are never extracted (:25);
  * every window of the read yields a k-mer — non-ACGT bases encode as 'A'
    (``Kmer::set_kmer`` leaves them 00), NOT skipped;
  * each k-mer is canonicalized by the memcmp rule and looked up in the
    differential set; a read is selected iff
    ``hits / (len − k + 1) > kmer_vote`` (strict, :59-64).

Two implementations of the same contract:

  * :func:`score_part` — host NumPy: reads are concatenated with k−1 pad
    bases between them, k-mers slide over the flat array, hits come from one
    ``searchsorted`` against the sorted differential key array, and per-read
    hit counts are cumulative-sum differences at read boundaries.
  * :func:`score_part_device` — the on-device twin: the flat code array is
    uploaded once per part; k-mers are built as (hi, lo) uint32 word pairs
    by k static shifted adds (JAX x64 stays off — 62-bit keys live in two
    lanes); canonicalization re-derives the memcmp key (bswap64 + 2-bit
    reversal) in paired-word arithmetic; membership is a vectorized
    lower-bound binary search over the sorted differential keys with
    lexicographic (hi, lo) compares; votes reduce per read via the same
    cumsum-difference trick. One bool[reads] comes back per part.
"""

from __future__ import annotations

import math
from functools import partial

import numpy as np

from kmerlsh_tpu.kmer import codec


def _pack_flat_codes(seqs: list[bytes], k: int) -> np.ndarray:
    """Concatenate reads with k−1 zero-code pad bases between them and
     2-bit-encode the whole blob in ONE table lookup. (A per-read
    ``seq_to_codes`` loop costs more than the entire scoring math at 2^16
    reads per part — this was the round-3 scorer bottleneck.) Pads encode
    as code 0; windows that overlap a pad are masked out by the callers."""
    blob = (b"\x00" * (k - 1)).join(seqs)
    return codec.BASE_TO_CODE[np.frombuffer(blob, dtype=np.uint8)]


def score_part(
    seqs: list[bytes], diff_keys: np.ndarray, k: int, kmer_vote: float
) -> np.ndarray:
    """Return a bool mask of selected reads.

    ``diff_keys`` must be a sorted uint64 array of canonical memcmp keys.
    """
    n = len(seqs)
    selected = np.zeros(n, dtype=bool)
    if n == 0 or len(diff_keys) == 0:
        return selected

    lens = np.fromiter((len(s) for s in seqs), count=n, dtype=np.int64)
    eligible = lens >= k + 10  # strict '<' skip in the reference (:25)

    flat = _pack_flat_codes(seqs, k)
    kmers = codec.sliding_kmers(flat, k)
    keys = codec.canonical_key(kmers, k)
    idx = np.searchsorted(diff_keys, keys)
    idx_c = np.minimum(idx, len(diff_keys) - 1)
    hit = (diff_keys[idx_c] == keys).astype(np.int64)

    # windows starting inside the k-1 pad after read i overlap read i+1's
    # prefix; mask them out, then reduce per read via cumsum differences
    starts = np.concatenate([[0], np.cumsum(lens + (k - 1))])[:-1]
    n_win = np.maximum(lens - k + 1, 0)
    win_start = starts
    # build validity: mark [start, start+n_win) for each read
    mark = np.zeros(len(kmers) + 1, dtype=np.int64)
    valid_reads = n_win > 0
    np.add.at(mark, win_start[valid_reads], 1)
    np.add.at(mark, (win_start + n_win)[valid_reads], -1)
    in_read = np.cumsum(mark[:-1]) > 0
    hit &= in_read

    chit = np.concatenate([[0], np.cumsum(hit)])
    counts = chit[np.minimum(win_start + n_win, len(kmers))] - chit[
        np.minimum(win_start, len(kmers))
    ]

    denom = (lens - k + 1).astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        ratio = np.where(denom > 0, counts / denom, 0.0)
    selected = eligible & (lens > 0) & (ratio > kmer_vote)
    # reference also skips empty-sequence reads explicitly (:21-24)
    selected &= np.fromiter((len(s) > 0 for s in seqs), count=n, dtype=bool)
    return selected


# --- on-device scorer --------------------------------------------------------

READS_CAP = 1 << 16          # reads per part (utils/fastq.h:36 contract)


def _pow2(n: int, lo: int = 1 << 12) -> int:
    return max(lo, 1 << math.ceil(math.log2(max(n, 1))))


def _bswap32(v):
    import jax.numpy as jnp

    v = v.astype(jnp.uint32)
    return ((v >> 24) | ((v >> 8) & 0xFF00)
            | ((v << 8) & 0xFF0000) | (v << 24)).astype(jnp.uint32)


def _reverse_bases_pair(hi, lo):
    """reverse_bases64 on (hi, lo) uint32 word pairs (codec.reverse_bases64
    semantics: swap 2-bit groups, then bswap64 — which crosses the words)."""
    import jax.numpy as jnp

    m2 = jnp.uint32(0x33333333)
    m4 = jnp.uint32(0x0F0F0F0F)

    def swaps(v):
        v = ((v >> 2) & m2) | ((v & m2) << 2)
        v = ((v >> 4) & m4) | ((v & m4) << 4)
        return v

    hi, lo = swaps(hi), swaps(lo)
    return _bswap32(lo), _bswap32(hi)       # bswap64 swaps the words


def _shift_right_pair(hi, lo, s: int):
    """(hi, lo) uint64 >> s for static 0 ≤ s < 64."""
    if s == 0:
        return hi, lo
    if s < 32:
        return hi >> s, (lo >> s) | (hi << (32 - s))
    if s == 32:
        return hi * 0, hi
    return hi * 0, hi >> (s - 32)


_DEVICE_KERNEL = None   # lazily jitted (this module must import without jax)


def _device_score_kernel(codes, win_start, n_win, lens, diff_hi, diff_lo,
                         n_diff, kmer_vote, k: int):
    """codes int32 [L] (k−1 zero pads between reads, zero tail), win_start /
    n_win / lens int32 [READS_CAP], diff_* uint32 [D] sorted by (hi, lo)
    with all-ones sentinels, n_diff int32 scalar. Returns bool [READS_CAP].
    """
    import jax.numpy as jnp

    L = codes.shape[0]
    nw = L - (k - 1)
    c = codes.astype(jnp.uint32)   # uint8 on the wire (4× less upload)

    # packed k-mer (codec layout: base j at bits 2j) in two 32-bit words
    lo = jnp.zeros((nw,), jnp.uint32)
    hi = jnp.zeros((nw,), jnp.uint32)
    for j in range(k):
        term = c[j : j + nw]
        if j < 16:
            lo = lo | (term << (2 * j))
        else:
            hi = hi | (term << (2 * (j - 16)))

    # revcomp = reverse_bases64(~packed) >> (64 − 2k)
    rc_hi, rc_lo = _reverse_bases_pair(~hi, ~lo)
    rc_hi, rc_lo = _shift_right_pair(rc_hi, rc_lo, 64 - 2 * k)

    # memcmp key = bswap64(packed); canonical = min(key(x), key(rc))
    kf_hi, kf_lo = _bswap32(lo), _bswap32(hi)
    kr_hi, kr_lo = _bswap32(rc_lo), _bswap32(rc_hi)
    f_less = (kf_hi < kr_hi) | ((kf_hi == kr_hi) & (kf_lo <= kr_lo))
    q_hi = jnp.where(f_less, kf_hi, kr_hi)
    q_lo = jnp.where(f_less, kf_lo, kr_lo)

    # vectorized lower-bound binary search over (diff_hi, diff_lo)
    d = diff_hi.shape[0]
    steps = max(1, math.ceil(math.log2(d)) + 1)
    lo_i = jnp.zeros((nw,), jnp.int32)
    hi_i = jnp.full((nw,), n_diff, jnp.int32)
    for _ in range(steps):
        mid = (lo_i + hi_i) >> 1
        mh = diff_hi[mid]
        ml = diff_lo[mid]
        less = (mh < q_hi) | ((mh == q_hi) & (ml < q_lo))
        lo_i = jnp.where(less, mid + 1, lo_i)
        hi_i = jnp.where(less, hi_i, mid)
    at = jnp.minimum(lo_i, d - 1)
    hit = ((lo_i < n_diff) & (diff_hi[at] == q_hi)
           & (diff_lo[at] == q_lo)).astype(jnp.int32)

    # windows inside the inter-read pads don't count
    mark = jnp.zeros((nw + 1,), jnp.int32)
    valid = n_win > 0
    ws = jnp.where(valid, win_start, nw)
    mark = mark.at[ws].add(1, mode="drop")
    mark = mark.at[jnp.where(valid, win_start + n_win, nw)].add(
        -1, mode="drop")
    in_read = jnp.cumsum(mark[:-1]) > 0
    hit = hit * in_read.astype(jnp.int32)

    chit = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(hit)])
    start_c = jnp.clip(win_start, 0, nw)
    end_c = jnp.clip(win_start + n_win, 0, nw)
    counts = chit[end_c] - chit[start_c]

    denom = jnp.maximum(lens - (k - 1), 1).astype(jnp.float32)
    ratio = counts.astype(jnp.float32) / denom
    return (lens >= k + 10) & (n_win > 0) & (ratio > kmer_vote)


# device-resident differential-key cache: mode E scores thousands of parts
# against the SAME diff-key array — upload it once, not per part. Keyed on
# object identity (the pipeline passes one array per group); the value holds
# a reference to the host array so the id cannot be recycled.
_DIFF_CACHE: dict = {}


def _diff_on_device(diff_keys: np.ndarray):
    import jax.numpy as jnp

    key = (id(diff_keys), len(diff_keys))
    hit = _DIFF_CACHE.get(key)
    if hit is not None:
        return hit[1], hit[2]
    dcap = _pow2(len(diff_keys), lo=2)
    dh = np.full(dcap, 0xFFFFFFFF, np.uint32)
    dl = np.full(dcap, 0xFFFFFFFF, np.uint32)
    dh[: len(diff_keys)] = (diff_keys >> np.uint64(32)).astype(np.uint32)
    dl[: len(diff_keys)] = (diff_keys & np.uint64(0xFFFFFFFF)).astype(
        np.uint32)
    jh, jl = jnp.asarray(dh), jnp.asarray(dl)
    _DIFF_CACHE.clear()                      # hold at most one set
    _DIFF_CACHE[key] = (diff_keys, jh, jl)
    return jh, jl


def score_part_device_async(
    seqs: list[bytes], diff_keys: np.ndarray, k: int, kmer_vote: float
):
    """Dispatch the device scorer and return a zero-arg resolver producing
    the bool mask — lets callers overlap the next part's parse/pack/upload
    with this part's device execution (double-buffered mode E)."""
    import jax.numpy as jnp

    n = len(seqs)
    if n == 0 or len(diff_keys) == 0:
        empty = np.zeros(n, dtype=bool)
        return lambda: empty
    if n > READS_CAP:
        raise ValueError(f"part has {n} reads > {READS_CAP}")

    lens = np.zeros(READS_CAP, np.int32)
    lens[:n] = [len(s) for s in seqs]
    flat = _pack_flat_codes(seqs, k)

    L = _pow2(len(flat) + k)     # static capacity: few distinct compiles
    codes = np.zeros(L, np.uint8)
    codes[: len(flat)] = flat

    starts = np.zeros(READS_CAP, np.int32)
    starts[:n] = np.concatenate(
        [[0], np.cumsum(lens[:n] + (k - 1))])[:-1]
    n_win = np.maximum(lens - k + 1, 0).astype(np.int32)
    n_win[n:] = 0

    jh, jl = _diff_on_device(diff_keys)

    global _DEVICE_KERNEL
    if _DEVICE_KERNEL is None:
        import jax

        _DEVICE_KERNEL = jax.jit(_device_score_kernel,
                                 static_argnames=("k",))
    out = _DEVICE_KERNEL(
        jnp.asarray(codes), jnp.asarray(starts), jnp.asarray(n_win),
        jnp.asarray(lens), jh, jl,
        jnp.int32(len(diff_keys)), jnp.float32(kmer_vote), k=k)
    return lambda: np.asarray(out)[:n]


def score_part_device(
    seqs: list[bytes], diff_keys: np.ndarray, k: int, kmer_vote: float
) -> np.ndarray:
    """Device twin of :func:`score_part` (identical selection contract)."""
    return score_part_device_async(seqs, diff_keys, k, kmer_vote)()


# --- native (C++) scorer -----------------------------------------------------

_NATIVE_SCORER_CACHE: dict = {}   # (id, len, k) → (diff_keys ref, scorer)


def score_part_native(
    seqs: list[bytes], diff_keys: np.ndarray, k: int, kmer_vote: float
) -> np.ndarray:
    """Native multithreaded twin of :func:`score_part` (identical selection
    contract; native/_native.cc ReadScorer). The differential set builds
    into an open-addressing table once per group — the host analog of the
    reference's per-group ``uset_t`` (io/ioFastQ.cc:99-103), but lock-free
    read-parallel."""
    import _kmerlsh_native as native

    n = len(seqs)
    if n == 0 or len(diff_keys) == 0:
        return np.zeros(n, dtype=bool)
    ck = (id(diff_keys), len(diff_keys), k)
    hit = _NATIVE_SCORER_CACHE.get(ck)
    if hit is None:
        scorer = native.ReadScorer(
            np.ascontiguousarray(diff_keys, np.uint64), k)
        _NATIVE_SCORER_CACHE.clear()          # hold at most one set
        _NATIVE_SCORER_CACHE[ck] = (diff_keys, scorer)
    else:
        scorer = hit[1]
    blob = b"".join(seqs)
    lens = np.fromiter((len(s) for s in seqs), count=n, dtype=np.int64)
    offs = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    mask = scorer.score(blob, np.ascontiguousarray(offs), float(kmer_vote))
    return np.frombuffer(mask, np.uint8).astype(bool)
