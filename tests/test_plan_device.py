"""Device planner (ops/plan_device.py) pinned bit-identical to the host paths.

- hash-directory lookup == value-sorted binary search (graph.keys.KeyArray)
- device find_runs == correct/seeds.find_runs (native or numpy)
- device 1-edit probe == correct/seeds.find_weak_seeds_batch
"""

import numpy as np
import pytest

from ratatosk_tpu.graph import build as B
from ratatosk_tpu.graph.keys import KeyArray
from ratatosk_tpu.ops import hash_index as HX
from ratatosk_tpu.ops import kmers as K
from ratatosk_tpu.ops.plan_device import DevicePlanner
from ratatosk_tpu.correct.seeds import find_runs, find_weak_seeds_batch
from ratatosk_tpu.testing import random_genome, short_reads, noisy_read


def _mk(k: int, glen: int = 20000, seed: int = 0):
    rng = np.random.default_rng(seed)
    genome = random_genome(rng, glen, repeat_frac=0.1, repeat_len=120)
    sreads = short_reads(rng, genome, coverage=25.0)
    cdbg = B.build_cdbg(sreads, k, min_count=2)
    return rng, genome, cdbg


def _runs_key(r):
    return (r.s, r.e, r.uid, r.direction, r.o_s, r.weak, r.rspan)


@pytest.mark.parametrize("k", [31, 63])
def test_hash_probe_matches_sorted_find(k):
    rng, genome, cdbg = _mk(k)
    hx = HX.HashKmerIndex.build(cdbg.index)
    keys = KeyArray(k, np.asarray(cdbg.index.keys_lo),
                    np.asarray(cdbg.index.keys_hi)
                    if cdbg.index.two_word else None)
    # mix of present keys and random absent ones
    q = np.asarray(cdbg.index.keys_lo)[
        rng.integers(0, cdbg.index.n, 500)].astype(np.uint64)
    q = np.concatenate([q, rng.integers(0, 1 << 62, 500).astype(np.uint64)])
    if cdbg.index.two_word:
        qh = np.asarray(cdbg.index.keys_hi)[
            rng.integers(0, cdbg.index.n, 500)].astype(np.uint64)
        qh = np.concatenate(
            [qh, rng.integers(0, 1 << 60, 500).astype(np.uint64)])
        # present pairs must come from the same row
        rows = rng.integers(0, cdbg.index.n, 500)
        q[:500] = np.asarray(cdbg.index.keys_lo)[rows]
        qh[:500] = np.asarray(cdbg.index.keys_hi)[rows]
        want = keys.find(KeyArray(k, q, qh))
        got = np.asarray(HX.probe_rows(hx, q, qh))
    else:
        want = keys.find(KeyArray(k, q, None))
        got = np.asarray(HX.probe_rows(hx, q, None))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("k", [31, 63])
def test_device_runs_match_host(k):
    rng, genome, cdbg = _mk(k)
    dp = DevicePlanner.build(cdbg)
    reads = []
    for i in range(12):
        start = int(rng.integers(0, len(genome) - 1500))
        noisy, _ = noisy_read(rng, genome, start, 1500, err=0.08)
        reads.append(noisy)
    reads.append(np.zeros(5, np.uint8))          # shorter than k
    got = dp.collect_runs(dp.dispatch_runs(reads))
    assert got is not None
    for r, g in zip(reads, got):
        want = find_runs(cdbg, r)
        assert [_runs_key(x) for x in g] == [_runs_key(x) for x in want]


@pytest.mark.parametrize("k,stride,nes", [(31, 1, 16), (31, 2, 0),
                                          (63, 2, 16)])
def test_device_probe_matches_host(k, stride, nes):
    rng, genome, cdbg = _mk(k, glen=30000, seed=3)
    dp = DevicePlanner.build(cdbg)
    reads, spans = [], []
    for i in range(8):
        start = int(rng.integers(0, len(genome) - 2000))
        noisy, _ = noisy_read(rng, genome, start, 2000, err=0.12)
        reads.append(noisy)
        spans.append((i, 100, 1900))
    want = find_weak_seeds_batch(cdbg, reads, spans, stride=stride,
                                 near_exact_skip=nes)
    got = dp.collect_probe(dp.dispatch_probe(
        reads, spans, stride=stride, near_exact_skip=nes))
    assert got is not None
    for w, g in zip(want, got):
        assert [_runs_key(x) for x in g] == [_runs_key(x) for x in w]


def test_prefilter_bitmap_no_false_negatives():
    rng, genome, cdbg = _mk(31, glen=8000)
    tbl, bits = HX.make_prefilter_bitmap(cdbg.index)
    lo = np.asarray(cdbg.index.keys_lo, np.uint64)
    rlo = K.revcomp_kmer(lo, 31, np)
    import jax.numpy as jnp
    for keys in (lo, rlo):       # both orientations must be present
        h = HX.hash_key64(keys, None, np)
        got = np.asarray(HX.prefilter_test(tbl, bits, jnp.asarray(h)))
        assert got.all()
