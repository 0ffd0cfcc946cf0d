"""SNP-bubble and short-cycle annotations on constructed genomes."""

import numpy as np

from ratatosk_tpu import dna
from ratatosk_tpu.graph import build as B
from ratatosk_tpu.graph import cycles as CY
from ratatosk_tpu.graph import snp as SNP
from ratatosk_tpu.graph.colors import color_graph
from tests import sim

K = 15


def test_snp_bubble_detection():
    rng = np.random.default_rng(300)
    hapA = sim.random_genome(rng, 4000)
    hapB = hapA.copy()
    # two heterozygous SNPs far apart
    snp_sites = [1000, 2500]
    for s in snp_sites:
        hapB[s] = (hapB[s] + 1) % 4
    reads = (sim.short_reads(rng, hapA, coverage=25.0, read_len=100)
             + sim.short_reads(rng, hapB, coverage=25.0, read_len=100))
    cdbg = B.build_cdbg(reads, K, min_count=2)
    colors = color_graph(cdbg, reads)
    ann = SNP.detect_snps(cdbg, colors)
    assert ann.n_sites >= 2 * len(snp_sites)  # each site on both branches
    # every annotated mask covers exactly 2 alleles and matches a genome SNP
    found = 0
    for u in range(cdbg.n_unitigs):
        pos, mask = ann.sites_for(u)
        for p, m in zip(pos, mask):
            assert bin(int(m)).count("1") == 2
            base = cdbg.unitig_codes(u)[p]
            assert int(dna.codes_to_masks(np.array([base]))[0]) & int(m)
            found += 1
    assert found == ann.n_sites


def test_no_snps_on_haploid_genome():
    # k=21: at production k-mer sizes (31/63) chance 1-substitution matches
    # between different loci are negligible; K=15 would find legitimate
    # near-repeat candidates the reference's probe would also surface
    rng = np.random.default_rng(301)
    genome = sim.random_genome(rng, 5000)
    reads = sim.short_reads(rng, genome, coverage=40.0, read_len=100)
    cdbg = B.build_cdbg(reads, 21, min_count=2)
    colors = color_graph(cdbg, reads)
    ann = SNP.detect_snps(cdbg, colors)
    assert ann.n_sites == 0


def test_snp_adjacent_to_branch_point():
    """A het SNP right next to a repeat-induced branch point is NOT a clean
    equal-length bubble — the cross-unitig 1-substitution probe + color-
    compatible neighborhood validation must still annotate it
    (detectSNPs, Graph.cpp:484-720; isValidSNPcandidate,
    GraphTraversal.cpp:1057-1147)."""
    rng = np.random.default_rng(303)
    k = 21
    rep = sim.random_genome(rng, 60)          # repeat -> branch points
    left = sim.random_genome(rng, 1500)
    mid = sim.random_genome(rng, 1500)
    right = sim.random_genome(rng, 1500)
    hapA = np.concatenate([left, rep, mid, rep, right])
    hapB = hapA.copy()
    site = len(left) + len(rep) + 4           # 4 bp after the repeat junction
    hapB[site] = (hapB[site] + 1) % 4
    reads = (sim.short_reads(rng, hapA, coverage=30.0, read_len=100)
             + sim.short_reads(rng, hapB, coverage=30.0, read_len=100))
    cdbg = B.build_cdbg(reads, k, min_count=2)
    colors = color_graph(cdbg, reads)
    ann = SNP.detect_snps(cdbg, colors)
    assert ann.n_sites >= 2      # both alleles annotated
    # at least one annotated site sits at the expected genome offset: find
    # the unitig holding hapA's site k-mer and check the annotation position
    from ratatosk_tpu.correct.seeds import find_runs
    win = hapA[site - k + 1: site + k]
    runs = find_runs(cdbg, win)
    assert runs, "site window must anchor on the graph"
    hit = False
    for r in runs:
        pos, mask = ann.sites_for(r.uid)
        for p, m in zip(pos, mask):
            hit |= bin(int(m)).count("1") == 2
    assert hit, "no IUPAC annotation on the site's unitigs"


def test_short_cycle_detection():
    rng = np.random.default_rng(302)
    # genome with an exact tandem repeat: unit shorter than 2k forms a cycle
    unit = sim.random_genome(rng, 20)
    flank1 = sim.random_genome(rng, 1500)
    flank2 = sim.random_genome(rng, 1500)
    genome = np.concatenate([flank1, np.tile(unit, 6), flank2])
    cdbg = B.build_cdbg([genome], K, min_count=1)
    cyc = CY.detect_short_cycles(cdbg)
    # lazy single-unitig probe (the engine's path) agrees with the batch scan
    for u in range(cdbg.n_unitigs):
        assert CY.unitig_on_cycle(cdbg, u) == bool(cyc[u])
    assert cyc.any(), "tandem repeat should produce a short cycle"
    # plain genome: no cycles
    cdbg2 = B.build_cdbg([flank1], K, min_count=1)
    assert not CY.detect_short_cycles(cdbg2).any()


def test_cycle_anchor_widens_region_budget():
    """A weak region anchored on a short-cycle unitig gets on_cycle=True and
    a doubled path budget (the fixRepeats widening,
    GraphTraversal.cpp:1149-1334), and still corrects across the tandem."""
    import numpy as np
    from ratatosk_tpu.config import CorrectOpt
    from ratatosk_tpu.correct.engine import Corrector, make_region_batch
    from ratatosk_tpu.graph import build as B
    from ratatosk_tpu.graph.colors import color_graph
    from tests import sim
    rng = np.random.default_rng(321)
    k = 17
    unit = sim.random_genome(rng, 30)
    genome = np.concatenate([sim.random_genome(rng, 3000)] + [unit] * 8
                            + [sim.random_genome(rng, 3000)])
    sreads = sim.short_reads(rng, genome, coverage=40.0, read_len=100)
    cdbg = B.build_cdbg(sreads, k, min_count=2)
    colors = color_graph(cdbg, sreads)
    corr = Corrector(cdbg, colors, CorrectOpt(small_k=k, k=63, beam_width=8,
                                              batch_regions=32))
    noisy, true = sim.long_reads(rng, genome, n=1, min_len=2000, max_len=2000,
                                 err=0.08)[0][:2], None
    noisy, true = noisy[0], noisy[1]
    reads_np = [np.asarray(noisy, np.uint8)]
    runs_list, wps_list = corr._plan_seeds(reads_np, None, [-1])
    regions = []
    corr._plan_read(0, reads_np[0], regions, runs=runs_list[0],
                    wps=wps_list[0])
    # some unitig of the tandem must register as cyclic
    assert any(corr._on_cycle(u) for u in range(cdbg.n_unitigs))
    cyc_regions = [sp for sp in regions if sp.on_cycle]
    if cyc_regions:
        rb, _ = make_region_batch(cyc_regions, 256, colors.cap,
                                  r_pad=max(8, len(cyc_regions)))
        mp = np.asarray(rb.max_plen)[:len(cyc_regions)]
        for sp, m in zip(cyc_regions, mp):
            assert m == int(np.ceil(1.5 * len(sp.tgt))) + 4
