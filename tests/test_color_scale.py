"""Scale behavior of graph coloring: streaming chunks, subsampling
(addCoverage phases 3+5, Graph.cpp:2139-2871)."""

import numpy as np

from ratatosk_tpu.graph import build as B
from ratatosk_tpu.graph.colors import color_graph, subsample_colors
from ratatosk_tpu.ops import colorset as CS
from tests import sim

K = 21


def _setup(rng, glen=8000, coverage=40.0):
    genome = sim.random_genome(rng, glen)
    sreads = sim.short_reads(rng, genome, coverage=coverage, read_len=100)
    cdbg = B.build_cdbg(sreads, K, min_count=2)
    return genome, sreads, cdbg


def test_chunked_streaming_matches_single_chunk():
    """Tiny chunk_bp forces many probe/merge rounds; the result must be
    bit-identical to one big chunk (the disk-spill/merge contract)."""
    rng = np.random.default_rng(900)
    genome, sreads, cdbg = _setup(rng)
    one = color_graph(cdbg, sreads, chunk_bp=1 << 30)
    many = color_graph(cdbg, sreads, chunk_bp=512)
    np.testing.assert_array_equal(one.rows, many.rows)
    np.testing.assert_array_equal(one.card, many.card)
    np.testing.assert_array_equal(one.coverage, many.coverage)
    np.testing.assert_array_equal(one.edge_support, many.edge_support)


def test_auto_subsample_reduces_cardinality_keeps_support():
    rng = np.random.default_rng(901)
    genome, sreads, cdbg = _setup(rng, coverage=60.0)
    full = color_graph(cdbg, sreads)
    sub = color_graph(cdbg, sreads, auto_subsample=True, target_cov=5.0)
    # cardinality drops substantially at 60x coverage
    assert sub.card.sum() < full.card.sum() * 0.6
    # every unitig that had colors keeps >= 2 (keep_min floor,
    # Graph.cpp:2353-2367)
    had = full.card >= 2
    assert (sub.card[had] >= 2).all()
    # ids are compacted to a dense range
    ids = sub.rows[sub.rows != CS.PAD]
    assert ids.max() < sub.n_colors
    assert sub.n_colors < full.n_colors
    # edge support survives subsampling (>= 2 shared reads per real edge)
    assert sub.edge_support.sum() >= full.edge_support.sum() * 0.9


def test_subsample_low_coverage_noop():
    rng = np.random.default_rng(902)
    genome, sreads, cdbg = _setup(rng, coverage=6.0)
    full = color_graph(cdbg, sreads)
    sub = color_graph(cdbg, sreads, auto_subsample=True)
    np.testing.assert_array_equal(full.rows, sub.rows)


def test_subsample_correction_parity():
    """e2e: correction quality with auto-subsampled colors matches the
    full-color engine (the subsampling 'accuracy parity' criterion)."""
    from ratatosk_tpu import testing
    from ratatosk_tpu.config import CorrectOpt
    from ratatosk_tpu.correct.engine import Corrector
    rng = np.random.default_rng(903)
    genome, sreads, cdbg = _setup(rng, glen=12000, coverage=60.0)
    lreads = sim.long_reads(rng, genome, n=3, min_len=1500, max_len=2500,
                            err=0.10)
    raw = np.mean([sim.error_rate(n, t) for n, t, _ in lreads])
    errs = {}
    for auto in (False, True):
        colors = color_graph(cdbg, sreads, auto_subsample=auto)
        opt = CorrectOpt(small_k=K, k=63, beam_width=8, batch_regions=32)
        corr = Corrector(cdbg, colors, opt)
        res = corr.correct_batch([x[0] for x in lreads])
        errs[auto] = np.mean([sim.error_rate(c.codes, t)
                              for (_, t, _), c in zip(lreads, res)])
    assert errs[True] < raw / 5
    assert errs[True] <= errs[False] * 2 + 1e-4


def test_spill_matches_inmemory():
    """Forcing PairStore disk spills must reproduce the in-memory coloring
    bit-for-bit (writeGraphPairID/mergeDiskPairIDs contract,
    Graph.cpp:803-867)."""
    rng = np.random.default_rng(904)
    genome, sreads, cdbg = _setup(rng)
    mem = color_graph(cdbg, sreads)
    spill = color_graph(cdbg, sreads, chunk_bp=2048, spill_bytes=4096)
    np.testing.assert_array_equal(mem.rows, spill.rows)
    np.testing.assert_array_equal(mem.card, spill.card)
    np.testing.assert_array_equal(mem.coverage, spill.coverage)
    np.testing.assert_array_equal(mem.edge_support, spill.edge_support)
    assert mem.n_colors == spill.n_colors


def test_spill_with_subsample_matches():
    rng = np.random.default_rng(905)
    genome, sreads, cdbg = _setup(rng, coverage=60.0)
    mem = color_graph(cdbg, sreads, auto_subsample=True, target_cov=5.0)
    spill = color_graph(cdbg, sreads, auto_subsample=True, target_cov=5.0,
                        chunk_bp=2048, spill_bytes=4096)
    np.testing.assert_array_equal(mem.rows, spill.rows)
    np.testing.assert_array_equal(mem.card, spill.card)
    np.testing.assert_array_equal(mem.edge_support, spill.edge_support)
    assert mem.n_colors == spill.n_colors


def test_pairstore_ten_million_pairs_bounded_memory(tmp_path):
    """>=10^7 synthetic pairs stream through a spilling PairStore whose live
    in-memory footprint stays under 24 MB (total pair bytes = 80 MB), and the
    merged stream is exactly the global sorted-unique set."""
    from ratatosk_tpu.graph.colors import PairStore
    rng = np.random.default_rng(906)
    chunk = 1 << 20
    n_total = 10 * chunk          # 10,485,760 draws
    store = PairStore(spill_bytes=8 << 20, spill_dir=str(tmp_path))
    # pairs over 200k unitigs x 2000 reads; duplicates across chunks exercise
    # the unique-merge
    for s in range(0, n_total, chunk):
        uid = rng.integers(0, 200_000, size=chunk, dtype=np.int64)
        rid = rng.integers(0, 2_000, size=chunk, dtype=np.int64)
        store.add(np.unique((uid << 32) | rid))
    assert len(store.files) >= 3
    total = 0
    last = -1
    for blk in store.merged_blocks():
        assert blk[0] > last            # globally sorted, unique across blocks
        assert (np.diff(blk) > 0).all()
        last = int(blk[-1])
        total += blk.size
    # expected count: unique of all draws (sampled space 200k*2k = 4e8,
    # ~10M draws -> ~1.2% collision); just sanity-band it
    assert 9_000_000 < total <= n_total
    assert store.max_live_bytes < 24 << 20
    store.cleanup()
    assert not store.files
