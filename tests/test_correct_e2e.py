"""End-to-end correction on simulated data.

The reference's de-facto acceptance test is error-rate reduction (README.md:5:
"error rate as low as 1.4%" from ~10% raw ONT). We assert a >5x reduction on
simulated reads, on both a simple and a repeat-heavy genome.
"""

import numpy as np
import pytest

from ratatosk_tpu.config import CorrectOpt
from ratatosk_tpu.correct.engine import Corrector
from ratatosk_tpu.graph import build as B
from ratatosk_tpu.graph.colors import color_graph
from tests import sim

K = 21


def _setup(rng, glen, repeat_frac=0.0):
    genome = sim.random_genome(rng, glen, repeat_frac=repeat_frac, repeat_len=200)
    sreads = sim.short_reads(rng, genome, coverage=40.0, read_len=120)
    cdbg = B.build_cdbg(sreads, K, min_count=2)
    colors = color_graph(cdbg, sreads)
    opt = CorrectOpt(small_k=K, k=63, beam_width=8, batch_regions=32)
    return genome, Corrector(cdbg, colors, opt)


def test_correct_simple_genome():
    rng = np.random.default_rng(100)
    genome, corr = _setup(rng, 12000)
    lreads = sim.long_reads(rng, genome, n=3, min_len=1500, max_len=2500, err=0.10)
    res = corr.correct_batch([x[0] for x in lreads])
    raw = np.mean([sim.error_rate(n, t) for n, t, _ in lreads])
    cor = np.mean([sim.error_rate(c.codes, t) for (_, t, _), c in zip(lreads, res)])
    assert raw > 0.07
    assert cor < raw / 5, f"corrected error {cor:.4f} vs raw {raw:.4f}"
    assert cor < 0.02


def test_correct_repetitive_genome():
    # 20x repeat content; the flank-aware chooseColors analog
    # (correct/choose.py) must disambiguate repeat copies — the bound is
    # 4x tighter than the simple-anchor-union engine achieved
    rng = np.random.default_rng(101)
    genome, corr = _setup(rng, 15000, repeat_frac=0.2)
    lreads = sim.long_reads(rng, genome, n=3, min_len=1500, max_len=2500, err=0.10)
    res = corr.correct_batch([x[0] for x in lreads])
    raw = np.mean([sim.error_rate(n, t) for n, t, _ in lreads])
    cor = np.mean([sim.error_rate(c.codes, t) for (_, t, _), c in zip(lreads, res)])
    assert cor < raw / 20, f"corrected error {cor:.4f} vs raw {raw:.4f}"


def test_quality_strings_sane():
    rng = np.random.default_rng(102)
    genome, corr = _setup(rng, 8000)
    lreads = sim.long_reads(rng, genome, n=1, min_len=1200, max_len=1500, err=0.08)
    res = corr.correct_batch([lreads[0][0]])
    cr = res[0]
    assert len(cr.qual) == len(cr.codes)
    assert (cr.qual >= 33).all() and (cr.qual <= 33 + 40).all()
    # most bases should be high-confidence (solid spans + clean corrections)
    assert (cr.qual >= 33 + 35).mean() > 0.5
    # FASTQ-printable
    assert all(33 <= c < 127 for c in cr.qual_str.encode())


def test_uncorrectable_read_passthrough():
    rng = np.random.default_rng(103)
    genome, corr = _setup(rng, 8000)
    # a read from a different random genome: no anchors -> returned raw
    other = sim.random_genome(np.random.default_rng(999), 2000)
    res = corr.correct_batch([other])
    np.testing.assert_array_equal(res[0].codes, other)
    assert res[0].n_solid == 0


def test_mirrored_retry_bucket_overflow_regression():
    """A gap whose mirror_tgt is LONGER than tgt (weak anchors, rspan k±1)
    must bucket by the mirrored length on the backward retry — at a bucket
    boundary (len(tgt)=256, len(mirror)=258) the old code packed a 258-base
    target into the 256 bucket and crashed (found by the r5 chr-scale run)."""
    import numpy as np
    from ratatosk_tpu import testing
    from ratatosk_tpu.correct.engine import RegionSpec

    _, corr = testing.build_toy_corrector(seed=11, glen=4000, k=17)
    rng = np.random.default_rng(0)
    n = 256
    sp = RegionSpec(
        read_idx=0, kind="gap", raw_a=0, raw_b=n,
        tgt=rng.integers(0, 4, n).astype(np.uint8),
        start_tip=0, start_off=corr.cdbg.k,
        end_tip=2, end_off=corr.cdbg.k,
        colors_row=corr.colors.rows[0].copy(),
        mirror=(3, corr.cdbg.k, 1, corr.cdbg.k),
        mirror_tgt=rng.integers(0, 4, n + 2).astype(np.uint8))
    # random target against a real graph: the forward walk fails, forcing
    # the mirrored retry that must land in the 2048 bucket
    corr._execute_regions([sp])
