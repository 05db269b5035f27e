"""Native C++ extension vs pure-Python equivalence (skipped if unbuilt)."""

import gzip

import numpy as np
import pytest

native = pytest.importorskip("_kmerlsh_native")

from kmerlsh_tpu.io import fastq, kmc  # noqa: E402
from kmerlsh_tpu.kmer import codec  # noqa: E402

RNG = np.random.default_rng(11)


def rand_seq(n):
    return "".join(RNG.choice(list("ACGT"), size=n))


def test_native_reader_matches_python(tmp_path):
    seqs = [rand_seq(80) for _ in range(500)]
    seqs[3] = seqs[3][:20] + "N" + seqs[3][21:]
    path = str(tmp_path / "r.fastq")
    with open(path, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f"@read{i} extra comment\n{s}\n+\n{'F' * len(s)}\n")

    native_reads = [r for part in fastq.read_parts([path], 128) for r in part]
    python_reads = list(fastq.read_records(path))
    assert len(native_reads) == len(python_reads) == 500
    for a, b in zip(native_reads, python_reads):
        assert (a.name, a.seq, a.qual) == (b.name, b.seq, b.qual)


def test_native_reader_gzip_and_fasta(tmp_path):
    path = str(tmp_path / "r.fa.gz")
    with gzip.open(path, "wt") as f:
        f.write(">s1 d\nACGTACGT\nTTTT\n>s2\nGGGG\n")
    rd = native.FastqReader(path)
    n, names, noff, seqs, soff, quals, qoff = rd.next_part(10)
    assert n == 2
    so = np.frombuffer(soff, dtype="<i8")
    assert seqs[so[0]:so[1]] == b"ACGTACGTTTTT"
    assert seqs[so[1]:so[2]] == b"GGGG"


@pytest.mark.parametrize("count_min", [1, 2])
def test_native_counter_matches_python_fallback(tmp_path, count_min):
    k = 13
    seqs = [rand_seq(70) for _ in range(200)]
    seqs[0] = "N" * 70
    seqs += seqs[:20]
    path = str(tmp_path / "c.fastq")
    with open(path, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f"@r{i}\n{s}\n+\n{'I' * len(s)}\n")

    pk_n, c_n = kmc.count_fastq([path], k, count_min=count_min)

    # force the NumPy fallback path
    import unittest.mock as mock

    with mock.patch.dict("sys.modules", {"_kmerlsh_native": None}):
        pk_p, c_p = kmc.count_fastq([path], k, count_min=count_min)

    assert np.array_equal(pk_n, pk_p)
    assert np.array_equal(c_n, c_p)


def test_native_counter_cap_and_lex_order():
    k = 5
    counter = native.KmerCounter(k)
    seq = b"AAAAA" * 100  # 496 occurrences of AAAAA (canonical of itself)
    off = np.array([0, len(seq)], dtype="<i8")
    counter.add(seq, off.tobytes())
    pk, cb = counter.finalize(1, 100)  # cap at 100
    packed = np.frombuffer(pk, dtype="<u8")
    counts = np.frombuffer(cb, dtype="<u4")
    assert codec.decode(packed[0], k) == "AAAAA"
    assert counts[0] == 100
    lex = codec.lex_value(packed, k)
    assert np.all(np.diff(lex.astype(np.int64)) > 0)


def test_native_render_clust_matches_fallback():
    """Native bytes-level .clust renderer == NumPy fallback, byte for byte
    (format: io/ioMatrix.cc:265-294)."""
    from kmerlsh_tpu.io import clusterio

    rng = np.random.default_rng(7)
    sizes = rng.integers(1, 9, size=5000).astype(np.int64)
    flat = rng.integers(0, 1 << 63, size=sizes.sum()).astype(np.uint64)
    # include boundary values
    flat[0] = 0
    flat[1] = np.uint64(2**64 - 1)
    native_out = clusterio._render_clust(flat, sizes)
    assert clusterio._native is not None
    import unittest.mock as mock

    with mock.patch.object(clusterio, "_native", None):
        fallback_out = clusterio._render_clust(flat, sizes)
    assert native_out == fallback_out
    # empty input renders empty
    assert clusterio._render_clust(
        np.empty(0, np.uint64), np.empty(0, np.int64)) == b""


def test_score_part_native_matches_host():
    """The native C++ read scorer (the default via `auto` wherever the
    extension is built) must reproduce the host scorer bit-for-bit on
    random reads across k values and votes — mirrors
    test_score_part_device_matches_host (ADVICE r4)."""
    from kmerlsh_tpu.ops import reads as readops

    rng = np.random.default_rng(7)
    for k in (7, 11, 16, 23, 31):
        marker = "".join(rng.choice(list("ACGT"), size=80))
        codes, _ = codec.seq_to_codes(marker.encode())
        diff = np.unique(
            codec.canonical_key(codec.sliding_kmers(codes, k), k))
        seqs = []
        for _ in range(300):
            ln = int(rng.integers(0, 90))
            if rng.random() < 0.4:
                start = int(rng.integers(0, 40))
                s = marker[start:start + ln]
            else:
                s = "".join(rng.choice(list("ACGTN"), size=ln))
            seqs.append(s.encode())
        seqs.append(b"")
        for vote in (0.3, 0.5, 1.0):
            host = readops.score_part(seqs, diff, k, vote)
            nat = readops.score_part_native(seqs, diff, k, vote)
            assert np.array_equal(host, nat), (k, vote)


def test_parse_clust_matches_python_fallback():
    """The native multithreaded .clust parser must agree with the NumPy
    fallback bit-for-bit, including boundary values and the missing-final-
    newline tolerance, and reject malformed size fields."""
    import unittest.mock as mock

    from kmerlsh_tpu.io import clusterio

    rng = np.random.default_rng(5)
    sizes = rng.integers(1, 9, size=4000).astype(np.int64)
    flat = rng.integers(0, 1 << 63, size=sizes.sum()).astype(np.uint64)
    flat[0] = 0
    flat[1] = np.uint64(2**64 - 1)
    text = clusterio._render_clust(flat, sizes)
    for blob in (text, text[:-1]):          # with and without final \n
        import tempfile, os

        with tempfile.NamedTemporaryFile(delete=False) as f:
            f.write(blob)
            path = f.name
        try:
            clusterio._CLUST_CACHE.clear()
            g_native = clusterio._parse_clust(path)
            with mock.patch.object(clusterio, "_native", None):
                g_py = clusterio._parse_clust(path)
            assert np.array_equal(g_native.flat, g_py.flat)
            assert np.array_equal(g_native.offsets, g_py.offsets)
        finally:
            os.unlink(path)

    import pytest

    with tempfile.NamedTemporaryFile(delete=False) as f:
        f.write(b"3\t1\t2\n")               # declared 3, only 2 ids
        bad = f.name
    try:
        clusterio._CLUST_CACHE.clear()
        with pytest.raises(ValueError):
            clusterio._parse_clust(bad)
    finally:
        os.unlink(bad)
