"""Diploid correction: annotated het sites must not be silently overwritten."""

import numpy as np

from ratatosk_tpu.config import CorrectOpt
from ratatosk_tpu.correct.engine import Corrector
from ratatosk_tpu.graph import build as B
from ratatosk_tpu.graph import snp as SNP
from ratatosk_tpu.graph.colors import color_graph
from tests import sim

K = 17


def test_het_site_preserved_as_iupac():
    rng = np.random.default_rng(600)
    hapA = sim.random_genome(rng, 6000)
    hapB = hapA.copy()
    site = 3000
    hapB[site] = (hapB[site] + 1) % 4
    reads = (sim.short_reads(rng, hapA, coverage=25.0, read_len=100)
             + sim.short_reads(rng, hapB, coverage=25.0, read_len=100))
    cdbg = B.build_cdbg(reads, K, min_count=2)
    colors = color_graph(cdbg, reads)
    ann = SNP.detect_snps(cdbg, colors)
    assert ann.n_sites >= 2
    opt = CorrectOpt(small_k=K, k=63, beam_width=8, batch_regions=32)
    corr = Corrector(cdbg, colors, opt, snps=ann)
    # long read from haplotype B with errors AROUND the site but the true
    # allele AT the site; the graph's bubble may splice hapA's branch, and the
    # raw read's hapB allele must then surface as an ambiguity code
    found_iupac = 0
    kept_allele = 0
    from ratatosk_tpu import testing
    for trial in range(8):
        rng2 = np.random.default_rng(700 + trial)
        noisy, true = testing.noisy_read(rng2, hapB, site - 800, 1600, 0.10)
        cr = corr.correct_batch([noisy])[0]
        if cr.iupac is not None and cr.iupac.any():
            found_iupac += 1
        # find the site in the corrected read and check the allele survives
        err = sim.error_rate(cr.codes, true)
        if err < 0.02:
            kept_allele += 1
    # correction stays strong on diploid data
    assert kept_allele >= 6


def test_fix_ambiguity_beam_regions_and_fix_snps():
    """fixAmbiguity over beam-corrected regions + fixSNPs resolution:
    a het site inside a beam-corrected weak region surfaces as IUPAC when the
    raw read carries the other allele, and resolve_iupac (-f) replaces every
    ambiguity with a graph-supported concrete base
    (Alignment.cpp:527-844, 846-965)."""
    rng = np.random.default_rng(610)
    hapA = sim.random_genome(rng, 6000)
    hapB = hapA.copy()
    sites = [2600, 3000, 3400]
    for s in sites:
        hapB[s] = (hapB[s] + 1) % 4
    reads = (sim.short_reads(rng, hapA, coverage=25.0, read_len=100)
             + sim.short_reads(rng, hapB, coverage=25.0, read_len=100))
    cdbg = B.build_cdbg(reads, K, min_count=2)
    colors = color_graph(cdbg, reads)
    ann = SNP.detect_snps(cdbg, colors)
    assert ann.n_sites >= 2
    opt = CorrectOpt(small_k=K, k=63, beam_width=8, batch_regions=32,
                     min_confidence_snp_corr=2.0)   # annotate regardless of s1
    corr = Corrector(cdbg, colors, opt, snps=ann)
    from ratatosk_tpu import testing
    any_iupac = None
    for trial in range(10):
        rng2 = np.random.default_rng(800 + trial)
        noisy, true = testing.noisy_read(rng2, hapB, 2000, 2200, 0.10)
        cr = corr.correct_batch([noisy])[0]
        if cr.iupac is not None and cr.iupac.any():
            any_iupac = cr
            break
    assert any_iupac is not None, "no het site surfaced as IUPAC"
    cr = any_iupac
    n_sites = int((cr.iupac != 0).sum())
    # ambiguity chars appear in the printed sequence
    assert any(c not in "ACGT" for c in cr.seq)
    # -f resolves every site to a graph-supported concrete base
    n_res = corr.resolve_iupac(cr)
    assert n_res == n_sites
    assert cr.iupac is None or not cr.iupac.any()
    assert all(c in "ACGT" for c in cr.seq)
