"""Pass-2 rephasing (-L): cross-haplotype pass-1 corrections are detected by
color inconsistency and spliced back to raw (phasing(), Graph.cpp:869-1097)."""

import os

import numpy as np

from ratatosk_tpu import cli, dna
from ratatosk_tpu.graph import build as B
from ratatosk_tpu.graph.colors import color_graph
from ratatosk_tpu.graph.rephase import (phase_inconsistent_segments,
                                        rephase_read)
from ratatosk_tpu.io import fastx
from tests import sim

K = 21


def _diploid(rng, glen=9000, n_snps=40):
    """Two haplotypes diverging inside a central 2kb block (dense enough that
    the block's unitigs separate per haplotype)."""
    hapA = sim.random_genome(rng, glen)
    hapB = hapA.copy()
    lo, hi = glen // 2 - 1000, glen // 2 + 1000
    for p in np.linspace(lo, hi, n_snps, dtype=int):
        hapB[p] = (hapB[p] + 1) % 4
    return hapA, hapB, lo, hi


def _colored_graph(rng, hapA, hapB):
    # color with long-read-like fragments per haplotype so hapA/hapB unitigs
    # carry DISJOINT read populations (the pass-2 coloring situation)
    frags, ids = [], []
    nid = 0
    for hap in (hapA, hapB):
        for s in range(0, len(hap) - 3000, 500):
            frags.append(hap[s:s + 3000])
            ids.append(nid)
            nid += 1
    cdbg = B.build_cdbg(
        sim.short_reads(rng, hapA, coverage=30.0, read_len=100)
        + sim.short_reads(rng, hapB, coverage=30.0, read_len=100),
        K, min_count=2)
    colors = color_graph(cdbg, frags, read_ids=ids)
    return cdbg, colors


def test_cross_haplotype_segment_detected_and_spliced():
    rng = np.random.default_rng(1200)
    hapA, hapB, lo, hi = _diploid(rng)
    cdbg, colors = _colored_graph(rng, hapA, hapB)

    # a "pass-1 corrected" read: hapB flanks with a hapA block spliced in the
    # middle (the cross-haplotype damage pass 1 can do)
    a, b = lo - 1500, hi + 1500
    corrected = np.concatenate([hapB[a:lo], hapA[lo:hi], hapB[hi:b]])
    raw = hapB[a:b].copy()   # the raw mate is pure hapB (error-free here)

    segs = phase_inconsistent_segments(cdbg, colors, corrected, insert_sz=500)
    assert segs, "hapA block not detected as phase-inconsistent"
    covered = sum(e - s for s, e in segs)
    # the detectable core: block unitigs whose comparison window reaches the
    # other haplotype's informative unitigs (block edges abut shared flanks
    # and are structurally invisible to color phasing)
    assert covered >= (hi - lo) * 0.4

    codes, qual, n = rephase_read(cdbg, colors, raw, corrected, None,
                                  insert_sz=500)
    assert n >= 1
    d_before = sim.error_rate(corrected, hapB[a:b])
    d_after = sim.error_rate(codes, hapB[a:b])
    assert d_after < d_before * 0.6, (d_before, d_after)


def test_consistent_read_untouched():
    rng = np.random.default_rng(1201)
    hapA, hapB, lo, hi = _diploid(rng)
    cdbg, colors = _colored_graph(rng, hapA, hapB)
    a, b = lo - 1500, hi + 1500
    pure = hapB[a:b]
    segs = phase_inconsistent_segments(cdbg, colors, pure, insert_sz=500)
    covered = sum(e - s for s, e in segs)
    assert covered < 200, segs   # a consistent read keeps (almost) all bases
    codes, _, n = rephase_read(cdbg, colors, pure.copy(), pure, None)
    if n == 0:
        np.testing.assert_array_equal(codes, pure)


def test_cli_L_flag_roundtrip(tmp_path):
    """-p/-P/-L plumbing: a 2nd-pass-only run pairs raw mates by name and
    rephases before correction; mismatched names abort."""
    rng = np.random.default_rng(1202)
    hapA, hapB, lo, hi = _diploid(rng)
    a, b = lo - 1500, hi + 1500
    corrected = np.concatenate([hapB[a:lo], hapA[lo:hi], hapB[hi:b]])
    raw = hapB[a:b]

    sr_path = str(tmp_path / "short.fa")
    with open(sr_path, "w") as f:
        for hap in (hapA, hapB):
            for i in range(0, len(hap) - 100, 3):
                f.write(f">s{hap[0]}{i}\n{dna.decode(hap[i:i+100])}\n")
    # name short reads uniquely
    with open(sr_path, "w") as f:
        n = 0
        for hap in (hapA, hapB):
            for i in range(0, len(hap) - 100, 3):
                f.write(f">s{n}\n{dna.decode(hap[i:i+100])}\n")
                n += 1
    lr_path = str(tmp_path / "p1out.fq")
    with open(lr_path, "w") as f:
        f.write(f"@r0\n{dna.decode(corrected)}\n+\n{'I'*len(corrected)}\n")
    raw_path = str(tmp_path / "raw.fq")
    with open(raw_path, "w") as f:
        f.write(f"@r0\n{dna.decode(raw)}\n+\n{'!'*len(raw)}\n")
    # helper long reads (-a) give the pass-2 graph haplotype-informative
    # colors (in production these come from all pass-1 corrected reads)
    helper_path = str(tmp_path / "helper.fa")
    with open(helper_path, "w") as f:
        n = 0
        for hap in (hapA, hapB):
            for s in range(0, len(hap) - 3000, 500):
                f.write(f">h{n}\n{dna.decode(hap[s:s+3000])}\n")
                n += 1
    out = str(tmp_path / "out")
    # k2=31 keeps the het block fragmented into haplotype-informative
    # unitigs (at k=63 with SNPs every ~50bp the block collapses into one
    # unitig pair and phase comparison has no on-read partners)
    rc = cli.main(["correct", "-s", sr_path, "-l", lr_path, "-o", out, "-2",
                   "-k", str(K), "-K", "31", "-L", raw_path, "-C", "100",
                   "-a", helper_path,
                   "--beam-width", "8", "--batch-regions", "32"])
    assert rc == 0
    rec = next(iter(fastx.read_fastx(out + ".fastq")))
    d_before = sim.error_rate(corrected, hapB[a:b])
    d_after = sim.error_rate(rec.codes, hapB[a:b])
    assert d_after < d_before * 0.7   # the detectable core flips back

    # mismatched raw name -> hard abort (Ratatosk.cpp:786-800)
    bad_raw = str(tmp_path / "bad.fq")
    with open(bad_raw, "w") as f:
        f.write(f"@WRONG\n{dna.decode(raw)}\n+\n{'!'*len(raw)}\n")
    import pytest
    with pytest.raises(SystemExit):
        cli.main(["correct", "-s", sr_path, "-l", lr_path, "-o", out, "-2",
                  "-k", str(K), "-K", "31", "-L", bad_raw, "-C", "100",
                  "--beam-width", "8", "--batch-regions", "32"])
