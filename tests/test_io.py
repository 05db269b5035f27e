"""I/O layer tests: KMC DB round trip, native counter vs brute force,
count-matrix artifacts, cluster files, FASTQ streaming."""

import os

import numpy as np
import pytest

from kmerlsh_tpu.io import clusterio, counts, fastq, kmc, samples
from kmerlsh_tpu.kmer import codec

RNG = np.random.default_rng(42)


def rand_seq(n, rng=RNG):
    return "".join(rng.choice(list("ACGT"), size=n))


def write_fastq(path, seqs, names=None):
    with open(path, "w") as f:
        for i, s in enumerate(seqs):
            name = names[i] if names else f"read{i}"
            f.write(f"@{name} comment{i}\n{s}\n+\n{'I' * len(s)}\n")


# --- KMC database codec ------------------------------------------------------

@pytest.mark.parametrize("k", [7, 15, 16, 23, 31])
def test_kmc1_roundtrip(tmp_path, k):
    n = 500
    seqs = {rand_seq(k) for _ in range(n)}
    packed = np.array([codec.encode_string(s) for s in sorted(seqs)], np.uint64)
    cnts = RNG.integers(1, 70000, size=len(packed)).astype(np.uint32)
    db = str(tmp_path / "db")
    kmc.write_db_kmc1(db, packed, cnts, k)
    packed2, cnts2, k2 = kmc.read_db(db)
    assert k2 == k
    lex = codec.lex_value(packed, k)
    order = np.argsort(lex, kind="stable")
    assert np.array_equal(packed2, packed[order])
    assert np.array_equal(cnts2, cnts[order])


def test_kmc1_empty_prefix_runs(tmp_path):
    # all k-mers share one prefix → most LUT slots empty (exercises the
    # CSR-with-duplicates searchsorted path)
    k = 15
    base = "AAA" + rand_seq(12)
    seqs = {base[:3] + rand_seq(12) for _ in range(100)}
    packed = np.array([codec.encode_string(s) for s in seqs], np.uint64)
    cnts = np.arange(1, len(packed) + 1, dtype=np.uint32)
    db = str(tmp_path / "db")
    kmc.write_db_kmc1(db, packed, cnts, k)
    packed2, cnts2, _ = kmc.read_db(db)
    assert set(map(int, packed2)) == set(map(int, packed))


@pytest.mark.parametrize("k,L", [(8, 4), (15, 3), (17, 1), (22, 2), (23, 7)])
@pytest.mark.parametrize("counter_size", [2, 4])
@pytest.mark.parametrize("n_bins", [1, 3])
def test_kmc2_roundtrip(tmp_path, k, L, counter_size, n_bins):
    """The version-0x200 read path (VERDICT r1 #5): header/LUT offset math
    across counter_size, k%4, and multi-bin CSR layouts, including the
    garbage end-sentinel the reader must overwrite."""
    n = 400
    seqs = {rand_seq(k) for _ in range(n)}
    packed = np.array([codec.encode_string(s) for s in sorted(seqs)], np.uint64)
    cnts = RNG.integers(1, (1 << (8 * counter_size)) - 1, size=len(packed),
                        dtype=np.uint64).astype(np.uint32)
    db = str(tmp_path / "db2")
    kmc.write_db_kmc2(db, packed, cnts, k, lut_prefix_len=L,
                      counter_size=counter_size, n_bins=n_bins)
    packed2, cnts2, k2 = kmc.read_db(db)
    assert k2 == k
    # KMC2 listing order is bin-major, not lexicographic: compare as a map
    want = dict(zip(map(int, packed), map(int, cnts)))
    got = dict(zip(map(int, packed2), map(int, cnts2)))
    assert got == want


def test_kmc2_build_count_matrix(tmp_path):
    """Stage B over KMC2-format databases end-to-end."""
    k = 15
    names = []
    keysets = []
    for s in range(3):
        seqs = {rand_seq(k) for _ in range(200)}
        packed = np.array([codec.encode_string(x) for x in seqs], np.uint64)
        canon = codec.canonical_key(packed, k)
        # canonicalize before writing (KMC dbs store canonical k-mers)
        packed = codec.packed_of_key(np.unique(canon))
        cnts = RNG.integers(1, 1000, size=len(packed)).astype(np.uint32)
        db = str(tmp_path / f"db2_{s}")
        kmc.write_db_kmc2(db, packed, cnts, k, n_bins=2)
        names.append(db)
        keysets.append(set(map(int, codec.canonical_key(packed, k))))
    kmap, v = counts.build_count_matrix(names, k, str(tmp_path))
    assert kmap == len(set().union(*keysets))
    assert len(v) == 3


# --- native counter ----------------------------------------------------------

def brute_counts(seqs, k, count_min, cs=65535):
    from collections import Counter

    c = Counter()
    comp = str.maketrans("ACGT", "TGCA")
    for s in seqs:
        for i in range(len(s) - k + 1):
            km = s[i : i + k]
            if any(ch not in "ACGT" for ch in km):
                continue
            rc = km.translate(comp)[::-1]
            c[min(km, rc)] += 1
    return {km: min(v, cs) for km, v in c.items() if v >= count_min}


@pytest.mark.parametrize("count_min", [1, 2])
def test_native_counter_matches_bruteforce(tmp_path, count_min):
    k = 11
    rng = np.random.default_rng(7)
    seqs = [rand_seq(60, rng) for _ in range(50)]
    # inject N bases and duplicate reads
    seqs[0] = seqs[0][:10] + "N" + seqs[0][11:]
    seqs += seqs[:5]
    fq = str(tmp_path / "a.fastq")
    write_fastq(fq, seqs)
    packed, cnts = kmc.count_fastq([fq], k, count_min=count_min)
    got = {codec.decode(np.uint64(p), k): int(c) for p, c in zip(packed, cnts)}
    assert got == brute_counts(seqs, k, count_min)


def test_run_kmc_fallback_writes_readable_db(tmp_path):
    k = 11
    rng = np.random.default_rng(13)
    seqs = [rand_seq(50, rng) for _ in range(20)]
    fq = str(tmp_path / "a.fastq")
    write_fastq(fq, seqs)
    db = str(tmp_path / "db")
    kmc.run_kmc(fq, db, k, count_min=1, threads=2, max_memory_gb=1,
                work_dir=str(tmp_path))
    packed, cnts, k2 = kmc.read_db(db)
    assert k2 == k and len(packed) > 0
    got = {codec.decode(np.uint64(p), k): int(c) for p, c in zip(packed, cnts)}
    assert got == brute_counts(seqs, k, 1)


def test_gzip_fastq(tmp_path):
    import gzip

    seqs = [rand_seq(40) for _ in range(10)]
    path = str(tmp_path / "a.fastq.gz")
    with gzip.open(path, "wt") as f:
        for i, s in enumerate(seqs):
            f.write(f"@r{i} c\n{s}\n+\n{'I' * len(s)}\n")
    reads = list(fastq.read_records(path))
    assert [r.seq.decode() for r in reads] == seqs
    assert reads[0].name == b"r0"  # comment stripped


def test_fasta_multiline(tmp_path):
    path = str(tmp_path / "a.fa")
    with open(path, "w") as f:
        f.write(">s1 desc\nACGT\nACGT\n>s2\nTTTT\n")
    reads = list(fastq.read_records(path))
    assert [(r.name, r.seq) for r in reads] == [(b"s1", b"ACGTACGT"), (b"s2", b"TTTT")]


# --- count-matrix artifacts --------------------------------------------------

def test_build_count_matrix_artifacts(tmp_path):
    k = 11
    rng = np.random.default_rng(3)
    dbs = []
    per_sample = []
    for s in range(3):
        seqs = {rand_seq(k, rng) for _ in range(100)}
        packed = np.array([codec.encode_string(x) for x in seqs], np.uint64)
        cnts = rng.integers(1, 100, size=len(packed)).astype(np.uint32)
        db = str(tmp_path / f"db{s}")
        kmc.write_db_kmc1(db, packed, cnts, k)
        dbs.append(db)
        per_sample.append((packed, cnts))

    kmap, v_kmers = counts.build_count_matrix(dbs, k, str(tmp_path))

    union_keys = counts.read_hex(str(tmp_path / "kmer_set.hex"))
    assert np.all(np.diff(union_keys.astype(np.uint64)) > 0)  # sorted unique
    want_union = np.unique(np.concatenate(
        [codec.canonical_key(p, k) for p, _ in per_sample]))
    assert np.array_equal(union_keys, want_union)
    assert kmap == len(want_union)

    mat = counts.read_count_batch(str(tmp_path / "kmer_count.bin"), 3, kmap, 0, kmap)
    assert mat.shape == (3, kmap)
    for s, (packed, cnts) in enumerate(per_sample):
        keys = codec.canonical_key(packed, k)
        for j in rng.integers(0, len(keys), size=20):
            row = np.searchsorted(union_keys, keys[j])
            assert mat[s, row] == min(int(cnts[j]), 65535)
        # absent k-mers are zero
        absent = np.setdiff1d(union_keys, keys)
        rows = np.searchsorted(union_keys, absent)
        assert not mat[s, rows].any()

    kmap2, covs = counts.read_log(str(tmp_path / "kmer_count.log"))
    assert kmap2 == kmap
    for s, (_, cnts) in enumerate(per_sample):
        assert covs[s] / kmap == pytest.approx(v_kmers[s], rel=1e-5)
        assert covs[s] == pytest.approx(float(np.log(cnts.astype(float)).sum()), rel=1e-5)

    # batched window read matches full read
    w = counts.read_count_batch(str(tmp_path / "kmer_count.bin"), 3, kmap, 5, 7)
    assert np.array_equal(w, mat[:, 5:12])


# --- cluster files -----------------------------------------------------------

def test_cluster_file_roundtrip(tmp_path):
    rng = np.random.default_rng(5)
    S = 4
    ids_list = [rng.integers(0, 1000, size=n).astype(np.uint64)
                for n in [1, 3, 7, 2, 10]]
    values = rng.normal(size=(5, S)).astype(np.float32)
    path = str(tmp_path / "res.bin")
    clusterio.save_result(ids_list, path + ".clust", ignore_small=2)
    clusterio.save_binary(values, ids_list, path, ignore_small=2)
    v2, ids2 = clusterio.read_cluster_all(path, S)
    keep = [i for i, ids in enumerate(ids_list) if len(ids) > 2]
    assert np.array_equal(v2, values[keep])
    assert all(np.array_equal(a, ids_list[i]) for a, i in zip(ids2, keep))
    # windowed read
    v3, ids3 = clusterio.read_cluster(path, S, 1, 2)
    assert np.array_equal(v3, v2[1:3])
    assert all(np.array_equal(a, b) for a, b in zip(ids3, ids2[1:3]))
    # append mode
    clusterio.save_result(ids_list[:1], path + ".clust", append=True, ignore_small=0)
    clusterio.save_binary(values[:1], ids_list[:1], path, append=True, ignore_small=0)
    v4, ids4 = clusterio.read_cluster_all(path, S)
    assert len(v4) == len(v2) + 1


def test_get_input(tmp_path):
    p = str(tmp_path / "list.txt")
    with open(p, "w") as f:
        f.write("a.fastq dbA\n\nb.fastq dbB\n")
    s, n = samples.get_input(p)
    assert s == ["a.fastq", "b.fastq"] and n == ["dbA", "dbB"]


def test_get_input_rejects_missing_kmc_name(tmp_path):
    p = str(tmp_path / "bad.txt")
    with open(p, "w") as f:
        f.write("a.fastq dbA\nb.fastq\n")
    with pytest.raises(ValueError, match="bad.txt:2"):
        samples.get_input(p)


def test_read_log_rejects_malformed(tmp_path):
    p = str(tmp_path / "kmer_count.log")
    with open(p, "w") as f:
        f.write("notanumber\t1.5")
    with pytest.raises(ValueError, match="malformed"):
        counts.read_log(p)
    with open(p, "w") as f:
        f.write("100")      # kmap but zero coverages
    with pytest.raises(ValueError, match="no per-sample"):
        counts.read_log(p)


def test_read_count_batch_rejects_truncated(tmp_path):
    p = str(tmp_path / "kmer_count.bin")
    np.zeros(10, "<u2").tofile(p)
    with pytest.raises(ValueError, match="truncated|does not match"):
        counts.read_count_batch(p, num_sample=3, num_kmer=100,
                                batch_offset=0, batch_size=10)
