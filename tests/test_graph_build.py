"""cDBG construction vs brute-force oracles on simulated genomes."""

import numpy as np
import pytest

from ratatosk_tpu import dna
from ratatosk_tpu.graph import build as B
from ratatosk_tpu.graph.keys import KeyArray
from tests import sim


def genome_kmers(genome: np.ndarray, k: int) -> KeyArray:
    ka, valid = KeyArray.from_codes(genome, k)
    can, _ = ka.take(np.flatnonzero(valid)).canonical()
    order = can.sort_order()
    uniq, _ = can.take(order).dedupe_sorted()
    return uniq


def oriented_unitig_codes(cdbg: B.Cdbg, packed: int) -> np.ndarray:
    v, d = packed >> 1, packed & 1
    codes = cdbg.unitig_codes(v)
    return dna.revcomp_codes(codes) if d else codes


def walk_genome(cdbg: B.Cdbg, genome: np.ndarray) -> bool:
    """Re-walk the genome through the graph, checking index + edge tables."""
    k = cdbg.k
    can, uid, pos, strand = B.catalog_kmer_positions(genome, np.array([0, len(genome)]), k)
    keys = KeyArray(k, np.asarray(cdbg.index.keys_lo),
                    np.asarray(cdbg.index.keys_hi) if cdbg.index.two_word else None)
    rows = keys.find(can)
    assert (rows >= 0).all(), "genome k-mer missing from index"
    iu = np.asarray(cdbg.index.unitig_id)[rows]
    ip = np.asarray(cdbg.index.pos)[rows]
    istr = np.asarray(cdbg.index.strand)[rows]
    # orientation of genome k-mer on its unitig: forward iff genome k-mer's
    # canonical orientation matches the stored strand flag
    fw = strand == istr
    nk = cdbg.nkmers
    for t in range(len(rows) - 1):
        u, p, f = int(iu[t]), int(ip[t]), bool(fw[t])
        u2, p2, f2 = int(iu[t + 1]), int(ip[t + 1]), bool(fw[t + 1])
        if u == u2 and f == f2 and (p2 - p == (1 if f else -1)):
            continue  # same unitig, consecutive
        # must cross an edge: leaving u on strand (0 if f else 1) with base c
        s = 0 if f else 1
        c = int(genome[t + k])  # next base appended
        e = cdbg.edges[u, s, c]
        assert e >= 0, f"missing edge at genome pos {t}"
        v, d = e >> 1, e & 1
        assert v == u2, f"edge target mismatch at pos {t}"
        assert (d == 0) == f2, f"edge direction mismatch at pos {t}"
        # entering forward must land on k-mer 0; reverse on last k-mer
        assert p2 == (0 if f2 else int(nk[u2]) - 1)
        # and we must be leaving from the end of u
        assert p == (int(nk[u]) - 1 if f else 0)
    return True


@pytest.mark.parametrize("k,glen", [(15, 3000), (31, 8000)])
def test_build_from_clean_genome(k, glen):
    rng = np.random.default_rng(7)
    genome = sim.random_genome(rng, glen)
    cdbg = B.build_cdbg([genome], k, min_count=1)
    # catalog holds exactly the distinct genome k-mers, each once
    gk = genome_kmers(genome, k)
    assert cdbg.total_kmers() == len(gk)
    assert cdbg.index.n == len(gk)
    walk_genome(cdbg, genome)
    # random genome without repeats -> a single unitig
    if glen <= 10000 and k == 31:
        assert cdbg.n_unitigs == 1


def test_build_with_repeats_and_branches():
    rng = np.random.default_rng(8)
    k = 15
    genome = sim.random_genome(rng, 6000, repeat_frac=0.3, repeat_len=120)
    cdbg = B.build_cdbg([genome], k, min_count=1)
    gk = genome_kmers(genome, k)
    assert cdbg.total_kmers() == len(gk)
    assert cdbg.n_unitigs > 1
    walk_genome(cdbg, genome)


def test_build_circular_genome():
    rng = np.random.default_rng(9)
    k = 21
    core = sim.random_genome(rng, 2000)
    circular = np.concatenate([core, core[:k - 1]])  # wraps: DBG is one cycle
    cdbg = B.build_cdbg([circular], k, min_count=1)
    gk = genome_kmers(circular, k)
    assert cdbg.total_kmers() == len(gk)
    assert cdbg.n_unitigs == 1
    # the single unitig is a broken cycle: its two ends connect to each other
    assert (cdbg.edges[0] >= 0).sum() == 2


def test_build_from_short_reads_min_count():
    rng = np.random.default_rng(10)
    k = 31
    genome = sim.random_genome(rng, 12000)
    reads = sim.short_reads(rng, genome, coverage=40.0, read_len=120)
    cdbg = B.build_cdbg(reads, k, min_count=2)
    gk = genome_kmers(genome, k)
    # 40x coverage: nearly every genome k-mer seen >=2 times
    keys = KeyArray(k, np.asarray(cdbg.index.keys_lo), None)
    rows = keys.find(gk)
    frac = float((rows >= 0).mean())
    assert frac > 0.98, f"only {frac:.3f} of genome k-mers recovered"
    # error-free reads: no spurious k-mers
    assert cdbg.index.n <= len(gk)


def test_build_from_reads_with_errors():
    rng = np.random.default_rng(11)
    k = 21
    genome = sim.random_genome(rng, 8000)
    reads = sim.short_reads(rng, genome, coverage=50.0, read_len=100, err=0.005)
    cdbg = B.build_cdbg(reads, k, min_count=2)
    gk = genome_kmers(genome, k)
    keys = KeyArray(k, np.asarray(cdbg.index.keys_lo), None)
    rows = keys.find(gk)
    assert float((rows >= 0).mean()) > 0.97
    # errorful k-mers mostly filtered by min_count
    assert cdbg.index.n < 1.3 * len(gk)


def test_two_word_build_k63():
    rng = np.random.default_rng(12)
    k = 63
    genome = sim.random_genome(rng, 5000)
    cdbg = B.build_cdbg([genome], k, min_count=1)
    gk = genome_kmers(genome, k)
    assert cdbg.total_kmers() == len(gk)
    assert cdbg.index.two_word
    walk_genome(cdbg, genome)


def test_revcomp_read_same_graph():
    rng = np.random.default_rng(13)
    k = 17
    genome = sim.random_genome(rng, 3000)
    g_rc = dna.revcomp_codes(genome)
    a = B.build_cdbg([genome], k, min_count=1)
    b = B.build_cdbg([g_rc], k, min_count=1)
    assert a.total_kmers() == b.total_kmers()
    np.testing.assert_array_equal(np.asarray(a.index.keys_lo), np.asarray(b.index.keys_lo))


def test_count_kmers_bucketed_matches_sorted():
    """Bucketed native counting (C radix + RLE) is bit-identical to the
    sort-everything path, both key widths."""
    import pytest
    from ratatosk_tpu.graph import build as B
    from ratatosk_tpu.ops import native_kmers as NK
    if not NK.available():
        pytest.skip("native kernels unavailable")
    rng = np.random.default_rng(7)
    reads = [rng.integers(0, 4, size=rng.integers(40, 300)).astype(np.uint8)
             for _ in range(300)]
    # sprinkle invalid bases so separator/validity paths are exercised
    for r in reads[::7]:
        r[rng.integers(0, len(r))] = 4
    for k in (31, 63):
        ref, ref_cnt = B.count_kmers(iter(reads), k, min_count=2)
        got, got_cnt = B.count_kmers_bucketed(reads, k, min_count=2)
        assert np.array_equal(ref.lo, got.lo)
        if k > 32:
            assert np.array_equal(ref.hi, got.hi)
        assert np.array_equal(ref_cnt, got_cnt)
        # max_count filter parity too
        ref2, _ = B.count_kmers(iter(reads), k, min_count=1, max_count=3)
        got2, _ = B.count_kmers_bucketed(reads, k, min_count=1, max_count=3)
        assert np.array_equal(ref2.lo, got2.lo)
