"""Unmapped short-read rescue (-u) oracle test."""

import numpy as np

from ratatosk_tpu.graph import rescue as RS
from tests import sim

K = 21


def test_find_missing_reads():
    rng = np.random.default_rng(400)
    genome = sim.random_genome(rng, 12000)
    # short reads cover only the first 8kb; the 8k-12k locus is "missing"
    sreads = sim.short_reads(rng, genome[:8000], coverage=30.0, read_len=100)
    # long reads cover everything (noisy but with err=0 here for determinism
    # of the k-mer sets; real ONT k-mers still hit at 2x count with coverage)
    lreads = [genome[s:s + 3000].copy() for s in (0, 2000, 5000, 7000, 9000, 8500)]
    # candidate unmapped reads: some from the uncovered locus, some random junk
    missing = [genome[s:s + 100].copy() for s in (9000, 10000, 11000)]
    junk = [sim.random_genome(np.random.default_rng(500 + i), 100)
            for i in range(3)]
    covered = [genome[s:s + 100].copy() for s in (1000, 3000)]
    cand = missing + junk + covered
    idx = RS.find_missing_reads(sreads, lreads, cand, k=K,
                                min_count_lr=2, min_nb_km_unmapped=31)
    assert set(idx) == {0, 1, 2}, f"got {idx}"
