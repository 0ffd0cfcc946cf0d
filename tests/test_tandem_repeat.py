"""Tandem-repeat correction e2e — the fixRepeats role.

The reference splices short-cycle copies into candidate paths when that
lowers edit distance to the raw read (fixRepeats,
GraphTraversal.cpp:1149-1334). Our beam traverses cycles natively (no
visited-set pruning) and regions anchored on cyclic unitigs get a doubled
path-length budget (engine.make_region_batch on_cycle). These tests prove
the mechanism end-to-end: reads over a tandem repeat correct to their own
copy structure — including a copy-number VARIANT read whose repeat count
differs from the dominant genome — because the alignment term of the path
score follows the raw read through the cycle.
"""

import numpy as np

from ratatosk_tpu.config import CorrectOpt
from ratatosk_tpu.correct.engine import Corrector
from ratatosk_tpu.graph import build as B
from ratatosk_tpu.graph.colors import color_graph
from ratatosk_tpu import dna
from ratatosk_tpu.ops import cigar as CG
from tests import sim

K = 21


def _build(rng, n_copies=5):
    unit = sim.random_genome(rng, 24)          # unit < 2k: a short cycle
    flankL = sim.random_genome(rng, 1500)
    flankR = sim.random_genome(rng, 1500)
    genome = np.concatenate([flankL] + [unit] * n_copies + [flankR])
    reads = sim.short_reads(rng, genome, coverage=45.0, read_len=100)
    cdbg = B.build_cdbg(reads, K, min_count=2)
    colors = color_graph(cdbg, reads)
    opt = CorrectOpt(small_k=K, k=63, beam_width=8, batch_regions=32)
    corr = Corrector(cdbg, colors, opt)
    return genome, unit, flankL, flankR, corr


def test_tandem_repeat_corrects_with_cycle_budget():
    rng = np.random.default_rng(830)
    genome, unit, flankL, flankR, corr = _build(rng)
    j = len(flankL)
    noisy, true = sim.noisy_long_read(np.random.default_rng(5), genome,
                                      j - 700, 1600, err=0.10)
    cr = corr.correct_batch([noisy])[0]
    err = sim.error_rate(cr.codes, true)
    raw = sim.error_rate(noisy, true)
    assert err < raw / 5
    # the full 5-copy repeat block survives exactly
    block = np.tile(unit, 5)
    d, _, _, _ = CG.aln_stats(dna.codes_to_masks(block),
                              dna.codes_to_masks(cr.codes), CG.HW)
    assert d == 0


def test_copy_number_variant_read_keeps_its_copies():
    """A read carrying SIX copies (the graph's short reads support five) must
    correct to six — the cycle is traversed once more because the alignment
    score follows the raw read (the fixRepeats contract)."""
    rng = np.random.default_rng(831)
    genome, unit, flankL, flankR, corr = _build(rng, n_copies=5)
    variant = np.concatenate([flankL] + [unit] * 6 + [flankR])
    j = len(flankL)
    noisy, true = sim.noisy_long_read(np.random.default_rng(6), variant,
                                      j - 700, 1650, err=0.08)
    cr = corr.correct_batch([noisy])[0]
    err = sim.error_rate(cr.codes, true)
    raw = sim.error_rate(noisy, true)
    assert err < raw / 4
    six = np.tile(unit, 6)
    d6, _, _, _ = CG.aln_stats(dna.codes_to_masks(six),
                               dna.codes_to_masks(cr.codes), CG.HW)
    # six copies present (a five-copy output would cost ~len(unit) edits)
    assert d6 <= 2
