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
    rng = np.random.default_rng(301)
    genome = sim.random_genome(rng, 5000)
    reads = sim.short_reads(rng, genome, coverage=40.0, read_len=100)
    cdbg = B.build_cdbg(reads, K, min_count=2)
    colors = color_graph(cdbg, reads)
    ann = SNP.detect_snps(cdbg, colors)
    assert ann.n_sites == 0


def test_short_cycle_detection():
    rng = np.random.default_rng(302)
    # genome with an exact tandem repeat: unit shorter than 2k forms a cycle
    unit = sim.random_genome(rng, 20)
    flank1 = sim.random_genome(rng, 1500)
    flank2 = sim.random_genome(rng, 1500)
    genome = np.concatenate([flank1, np.tile(unit, 6), flank2])
    cdbg = B.build_cdbg([genome], K, min_count=1)
    cyc = CY.detect_short_cycles(cdbg)
    assert cyc.any(), "tandem repeat should produce a short cycle"
    # plain genome: no cycles
    cdbg2 = B.build_cdbg([flank1], K, min_count=1)
    assert not CY.detect_short_cycles(cdbg2).any()
