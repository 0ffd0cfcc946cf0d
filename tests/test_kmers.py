"""k-mer packing/canonicalization vs string oracles."""

import numpy as np
import pytest

from ratatosk_tpu import dna
from ratatosk_tpu.ops import kmers as K


def pack_str(s: str) -> int:
    v = 0
    for ch in s:
        v = (v << 2) | int(dna.encode(ch)[0])
    return v


def rand_seq(rng, n, with_n=False):
    alpha = "ACGTN" if with_n else "ACGT"
    p = [0.23, 0.24, 0.25, 0.23, 0.05] if with_n else None
    return "".join(rng.choice(list(alpha), size=n, p=p))


@pytest.mark.parametrize("k", [5, 17, 31, 32])
def test_pack_kmers_single_word(k):
    rng = np.random.default_rng(0)
    s = rand_seq(rng, 200)
    codes = dna.encode(s)
    km, valid = K.pack_kmers(codes, k, np)
    assert valid.all()
    for i in range(0, len(s) - k + 1, 7):
        assert int(km[i]) == pack_str(s[i:i + k])


@pytest.mark.parametrize("k", [33, 47, 63, 64])
def test_pack_kmers_two_word(k):
    rng = np.random.default_rng(1)
    s = rand_seq(rng, 300)
    codes = dna.encode(s)
    hi, lo, valid = K.pack_kmers(codes, k, np)
    assert valid.all()
    for i in range(0, len(s) - k + 1, 11):
        full = pack_str(s[i:i + k])
        assert int(lo[i]) == full & ((1 << 64) - 1)
        assert int(hi[i]) == full >> 64


def test_pack_kmers_invalid_windows():
    s = "ACGTNACGTACGTACGT"
    codes = dna.encode(s)
    km, valid = K.pack_kmers(codes, 4, np)
    # windows overlapping position 4 (N) are invalid
    expect = np.array([i + 4 <= 4 or i > 4 for i in range(len(s) - 3)])
    np.testing.assert_array_equal(valid, expect)


@pytest.mark.parametrize("k", [3, 15, 31, 32])
def test_revcomp_kmer(k):
    rng = np.random.default_rng(2)
    for _ in range(20):
        s = rand_seq(rng, k)
        km = np.uint64(pack_str(s))
        rc = K.revcomp_kmer(km, k, np)
        assert int(rc) == pack_str(dna.revcomp_str(s))


@pytest.mark.parametrize("k", [33, 48, 63, 64])
def test_revcomp_kmer2(k):
    rng = np.random.default_rng(3)
    for _ in range(20):
        s = rand_seq(rng, k)
        full = pack_str(s)
        hi = np.uint64(full >> 64)
        lo = np.uint64(full & ((1 << 64) - 1))
        rhi, rlo = K.revcomp_kmer2(hi, lo, k, np)
        rfull = pack_str(dna.revcomp_str(s))
        assert int(rhi) == rfull >> 64 and int(rlo) == rfull & ((1 << 64) - 1)


def test_canonical_involution():
    rng = np.random.default_rng(4)
    k = 31
    s = rand_seq(rng, 500)
    codes = dna.encode(s)
    km, _ = K.pack_kmers(codes, k, np)
    can, is_fw = K.canonical_kmer(km, k, np)
    # canonical of the revcomp read must give the same canonical set, reversed
    rc_codes = dna.revcomp_codes(codes)
    km_rc, _ = K.pack_kmers(rc_codes, k, np)
    can_rc, _ = K.canonical_kmer(km_rc, k, np)
    np.testing.assert_array_equal(can, can_rc[::-1])


def test_canonical2_involution():
    rng = np.random.default_rng(5)
    k = 63
    s = rand_seq(rng, 400)
    codes = dna.encode(s)
    hi, lo, _ = K.pack_kmers(codes, k, np)
    chi, clo, _ = K.canonical_kmer2(hi, lo, k, np)
    rc = dna.revcomp_codes(codes)
    hi2, lo2, _ = K.pack_kmers(rc, k, np)
    chi2, clo2, _ = K.canonical_kmer2(hi2, lo2, k, np)
    np.testing.assert_array_equal(chi, chi2[::-1])
    np.testing.assert_array_equal(clo, clo2[::-1])


def test_jax_matches_numpy():
    import jax.numpy as jnp
    rng = np.random.default_rng(6)
    s = rand_seq(rng, 256, with_n=True)
    codes = dna.encode(s)
    for k in (13, 31):
        km_np, v_np = K.pack_kmers(codes, k, np)
        km_j, v_j = K.pack_kmers(jnp.asarray(codes), k, jnp)
        np.testing.assert_array_equal(np.asarray(v_j), v_np)
        np.testing.assert_array_equal(np.asarray(km_j)[v_np], km_np[v_np])
        can_np, fw_np = K.canonical_kmer(km_np, k, np)
        can_j, fw_j = K.canonical_kmer(jnp.asarray(km_np), k, jnp)
        np.testing.assert_array_equal(np.asarray(can_j), can_np)
        np.testing.assert_array_equal(np.asarray(fw_j), fw_np)
    h_np = K.hash_kmer(km_np, np)
    h_j = K.hash_kmer(jnp.asarray(km_np), jnp)
    np.testing.assert_array_equal(np.asarray(h_j), h_np)


def test_dna_roundtrip_and_entropy():
    s = "ACGTRYN"
    m = dna.encode_masks(s)
    assert dna.decode_masks(m) == s
    assert dna.decode(dna.encode("acgt")) == "ACGT"
    e = dna.entropy(dna.encode("ACGTACGTACGT"))
    assert abs(e - 2.0) < 1e-9
    assert dna.entropy(dna.encode("AAAAAAA")) == 0.0
    # quality helpers: linear scale (Common.hpp:410-428)
    assert dna.get_qual_char(1.0) == 73
    assert dna.get_qual_char(0.0) == 33
    assert abs(dna.get_score(73) - 1.0) < 1e-9
