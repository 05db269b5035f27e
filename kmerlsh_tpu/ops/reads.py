"""Differential-read scoring (mode E's hot loop #3).

Reference semantics (``IOFQ::CheckRead``, io/ioFastQ.cc:5-76):
  * reads with empty sequence are skipped (:21-24);
  * reads shorter than k+10 are never extracted (:25);
  * every window of the read yields a k-mer — non-ACGT bases encode as 'A'
    (``Kmer::set_kmer`` leaves them 00), NOT skipped;
  * each k-mer is canonicalized by the memcmp rule and looked up in the
    differential set; a read is selected iff
    ``hits / (len − k + 1) > kmer_vote`` (strict, :59-64).

Implementation: the whole 65536-read part is scored in one vectorized pass —
reads are concatenated with k−1 pad bases between them, k-mers slide over the
flat array, hits come from one ``searchsorted`` against the sorted
differential key array, and per-read hit counts are cumulative-sum
differences at read boundaries. Host NumPy for the uint64 key lookups (JAX
x64 stays off); the flat structure maps 1:1 onto a Pallas kernel for the
on-device path.
"""

from __future__ import annotations

import numpy as np

from kmerlsh_tpu.kmer import codec


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

    pad = np.zeros(k - 1, dtype=np.uint8) if k > 1 else np.empty(0, np.uint8)
    blobs = []
    for s in seqs:
        c, _ = codec.seq_to_codes(s)
        blobs += [c, pad]
    flat = np.concatenate(blobs) if blobs else np.empty(0, np.uint8)

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
