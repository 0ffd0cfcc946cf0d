"""Pass-1 low-coverage edge rescue from the k2 graph (Graph.cpp:3085-3363).

Scenario: a 45 bp repeat X (longer than k1-1=30, shorter than k2-1=62)
appears twice, so the k1=31 graph breaks into unitigs A|X|B (+ C|X|D) while
one k2=63 unitig spans A+X+B. Every short read crossing the first junction
shares ONE color id (PCR-duplicate analog — deduplicated read pairs share
ids, Graph.cpp:2089-2136), so the k1 edges A->X and X->B have < 2 shared
read colors and the support filter forbids the beam from crossing — until
the k63 unitig rescues them with pseudo-read support.
"""

import numpy as np

from ratatosk_tpu.config import CorrectOpt
from ratatosk_tpu.correct.engine import Corrector
from ratatosk_tpu.graph import build as B
from ratatosk_tpu.graph.colors import color_graph
from ratatosk_tpu.graph.rescue_edges import rescue_pass1_edges
from tests import sim

K1, K2 = 31, 63
READ_LEN = 100


def _setup(rng):
    A = sim.random_genome(rng, 1200)
    X = sim.random_genome(rng, 45)
    Bseg = sim.random_genome(rng, 1200)
    C = sim.random_genome(rng, 900)
    D = sim.random_genome(rng, 900)
    genome = np.concatenate([A, X, Bseg, C, X, D])
    j1 = len(A)                      # first junction window [j1, j1+45)
    reads, ids = [], []
    next_id = 0
    dup_id = None
    step = 9                         # ~11x forward coverage
    for start in range(0, len(genome) - READ_LEN + 1, step):
        reads.append(genome[start:start + READ_LEN].copy())
        # reads overlapping the first X occurrence share one color id
        if start + READ_LEN > j1 - 2 and start < j1 + 45 + 2:
            if dup_id is None:
                dup_id = next_id
                next_id += 1
            ids.append(dup_id)
        else:
            ids.append(next_id)
            next_id += 1
    return genome, reads, ids, j1


def test_rescue_supports_k63_proven_junctions():
    rng = np.random.default_rng(820)
    genome, reads, ids, j1 = _setup(rng)
    cdbg = B.build_cdbg(reads, K1, min_count=2)
    colors = color_graph(cdbg, reads, read_ids=ids)
    before = colors.edge_support.sum()
    n_colors_before = colors.n_colors
    cdbg2 = B.build_cdbg(reads, K2, min_count=2)
    n = rescue_pass1_edges(cdbg, colors, cdbg2, min_cov=2)
    assert n >= 1                    # the A->X junction (mirror set too)
    assert colors.edge_support.sum() > before
    assert colors.n_colors > n_colors_before   # fresh pseudo ids allocated


def test_rescue_enables_correction_across_junction():
    rng = np.random.default_rng(821)
    genome, reads, ids, j1 = _setup(rng)
    cdbg = B.build_cdbg(reads, K1, min_count=2)
    opt = CorrectOpt(small_k=K1, k=K2, beam_width=8, batch_regions=32)
    noisy, true = sim.noisy_long_read(
        np.random.default_rng(77), genome, j1 - 600, 1300, err=0.10)

    errs = {}
    for rescued in (False, True):
        colors = color_graph(cdbg, reads, read_ids=ids)
        if rescued:
            cdbg2 = B.build_cdbg(reads, K2, min_count=2)
            assert rescue_pass1_edges(cdbg, colors, cdbg2, min_cov=2) >= 1
        corr = Corrector(cdbg, colors, opt)
        cr = corr.correct_batch([noisy])[0]
        errs[rescued] = sim.error_rate(cr.codes, true)
    raw = sim.error_rate(noisy, true)
    # with rescue the junction corrects well; without it the region around
    # the unsupported junction stays (mostly) raw
    assert errs[True] < raw / 5
    assert errs[True] < errs[False]
