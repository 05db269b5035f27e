"""Unit tests for the 2-bit uint64 k-mer codec vs string-level oracles.

Oracles reimplement the *observable semantics* of the reference ``Kmer``
class (kmer/Kmer.cc): byte packing, memcmp ordering, twin(), forwardBase.
"""

import numpy as np
import pytest

from kmerlsh_tpu.kmer import codec

RNG = np.random.default_rng(0)
_COMP = str.maketrans("ACGT", "TGCA")


def rand_seq(n):
    return "".join(RNG.choice(list("ACGT"), size=n))


def ref_pack_bytes(s: str) -> bytes:
    """Byte-exact oracle of Kmer::set_kmer + writeBytes (8 bytes, zero pad)."""
    by = bytearray(8)
    for i, ch in enumerate(s):
        c = {"A": 0, "C": 1, "G": 2, "T": 3}.get(ch, 0)
        by[i // 4] |= c << (2 * (i % 4))
    return bytes(by)


def ref_revcomp(s: str) -> str:
    return s.translate(_COMP)[::-1]


@pytest.mark.parametrize("k", [5, 15, 16, 23, 31])
def test_pack_matches_reference_bytes(k):
    for _ in range(20):
        s = rand_seq(k)
        v = codec.encode_string(s)
        assert int(v).to_bytes(8, "little") == ref_pack_bytes(s)
        assert codec.decode(v, k) == s


@pytest.mark.parametrize("k", [5, 23, 31])
def test_revcomp(k):
    seqs = [rand_seq(k) for _ in range(50)]
    packed = np.array([codec.encode_string(s) for s in seqs], dtype=np.uint64)
    rc = codec.revcomp(packed, k)
    got = codec.decode(rc, k)
    assert got == [ref_revcomp(s) for s in seqs]


@pytest.mark.parametrize("k", [5, 23, 31])
def test_canonical_matches_memcmp_rule(k):
    for _ in range(100):
        s = rand_seq(k)
        v = codec.encode_string(s)
        ck = codec.canonical_key(v, k)
        # oracle: memcmp over the 8 packed bytes
        fwd_b, rc_b = ref_pack_bytes(s), ref_pack_bytes(ref_revcomp(s))
        want = min(fwd_b, rc_b)
        assert int(ck).to_bytes(8, "big") == want  # key is bswapped packed


def test_key_roundtrip():
    k = 23
    packed = np.array([codec.encode_string(rand_seq(k)) for _ in range(10)])
    keys = codec.key_of(packed)
    assert np.array_equal(codec.packed_of_key(keys), packed)


def test_key_order_is_memcmp_order():
    k = 23
    seqs = [rand_seq(k) for _ in range(200)]
    packed = np.array([codec.encode_string(s) for s in seqs], dtype=np.uint64)
    keys = codec.key_of(packed)
    order_keys = np.argsort(keys, kind="stable")
    order_bytes = sorted(range(len(seqs)), key=lambda i: ref_pack_bytes(seqs[i]))
    assert list(order_keys) == order_bytes


@pytest.mark.parametrize("k", [5, 23, 31])
def test_forward_base_and_sliding(k):
    s = rand_seq(200)
    codes, valid = codec.seq_to_codes(s.encode())
    assert valid.all()
    kmers = codec.sliding_kmers(codes, k)
    assert len(kmers) == 200 - k + 1
    # rolling consistency with forward_base
    v = codec.encode_string(s[:k])
    assert kmers[0] == v
    for j in range(1, len(kmers)):
        v = codec.forward_base(v, codes[j + k - 1], k)
        assert kmers[j] == v
    # direct string check
    assert codec.decode(kmers[37], k) == s[37 : 37 + k]


def test_non_acgt_maps_to_A():
    # reference set_kmer leaves unknown bases as 00 == 'A' (kmer/Kmer.cc:121-129)
    v = codec.encode_string("ANGNT")
    assert codec.decode(v, 5) == "AAGAT"
    codes, valid = codec.seq_to_codes(b"ANGNT")
    assert list(valid) == [True, False, True, False, True]
    mask = codec.valid_kmer_mask(valid, 3)
    assert list(mask) == [False, False, False]


def test_lex_value_order():
    k = 9
    seqs = [rand_seq(k) for _ in range(100)]
    packed = np.array([codec.encode_string(s) for s in seqs], dtype=np.uint64)
    lex = codec.lex_value(packed, k)
    assert list(np.argsort(lex, kind="stable")) == sorted(
        range(len(seqs)), key=lambda i: seqs[i]
    )
    assert np.array_equal(codec.packed_of_lex(lex, k), packed)


def test_canonical_lex_matches_string_min():
    k = 11
    for _ in range(50):
        s = rand_seq(k)
        got = codec.canonical_lex(codec.encode_string(s), k)
        want = min(s, ref_revcomp(s))
        assert codec.decode(np.uint64(got), k) == want
