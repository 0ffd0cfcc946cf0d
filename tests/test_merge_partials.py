"""Region-wise fw/bw partial-consensus merge (generateConsensus,
Alignment.cpp:309-470): overlapping partials keep the longer-corrected side
in the overlap and splice the other side's remainder at a CIGAR-mapped cut
(moveIntoCIGAR + per-region choice, Alignment.cpp:354-448)."""

import numpy as np

from ratatosk_tpu import dna, testing
from ratatosk_tpu.config import CorrectOpt
from ratatosk_tpu.correct.engine import Corrector, RegionSpec


def _corrector():
    _, corr = testing.build_toy_corrector(seed=11, glen=3000, k=17)
    return corr


def _spec(tgt, k):
    return RegionSpec(read_idx=0, kind="gap", raw_a=0, raw_b=len(tgt),
                      tgt=tgt, start_tip=0, start_off=k, end_tip=2,
                      end_off=k, colors_row=np.zeros(4, np.int32),
                      end_anchor=tgt[-k:].copy(), end_win=k)


def test_overlapping_partials_fw_priority():
    corr = _corrector()
    k = corr.cdbg.k
    rng = np.random.default_rng(3)
    true = rng.integers(0, 4, size=120).astype(np.uint8)
    tgt = true.copy()
    tgt[40] = (tgt[40] + 1) % 4          # a raw error both sides would fix
    sp = _spec(tgt, k)
    n = len(tgt)
    # fw corrected target columns [0, 90) (true bases); bw corrected
    # [n-k-70, n-k) -> overlap [n-k-70, 90)
    sp.partial_fw = (true[:90].copy(), 90, 0.95)
    bw_cov = true[n - k - 70:n - k]
    sp.partial_bw = (dna.revcomp_codes(bw_cov), 70, 0.90)
    assert corr._merge_partials(sp)
    # fw wins the overlap (90 >= 70); the result must equal the true
    # sequence over the whole merged region
    np.testing.assert_array_equal(sp.seq[:n - k], true[:n - k])
    np.testing.assert_array_equal(sp.seq[-k:], tgt[-k:])
    assert sp.ok


def test_overlapping_partials_bw_priority():
    corr = _corrector()
    k = corr.cdbg.k
    rng = np.random.default_rng(4)
    true = rng.integers(0, 4, size=120).astype(np.uint8)
    tgt = true.copy()
    tgt[70] = (tgt[70] + 1) % 4
    sp = _spec(tgt, k)
    n = len(tgt)
    # bw corrected the longer stretch: bw covers [n-k-95, n-k), fw [0, 60)
    sp.partial_fw = (true[:60].copy(), 60, 0.9)
    bw_cov = true[n - k - 95:n - k]
    sp.partial_bw = (dna.revcomp_codes(bw_cov), 95, 0.95)
    assert corr._merge_partials(sp)
    np.testing.assert_array_equal(sp.seq[:n - k], true[:n - k])
    assert sp.ok


def test_partial_with_indel_splices_at_cigar_cut():
    """The losing side's remainder is mapped through a CIGAR (its path may
    be shorter/longer than the raw target it covers)."""
    corr = _corrector()
    k = corr.cdbg.k
    rng = np.random.default_rng(5)
    true = rng.integers(0, 4, size=140).astype(np.uint8)
    tgt = np.concatenate([true[:50], [true[50]], true[50:]]).astype(np.uint8)
    # raw target has one EXTRA base at 50 -> bw path is 1 shorter than its
    # covered raw span
    sp = _spec(tgt, k)
    n = len(tgt)
    sp.partial_fw = (true[:80].copy(), 81, 0.95)   # covers raw cols [0, 81)
    bw_cov_raw = n - k - 30                        # bw covers raw [nb0, n-k)
    bw_path = true[len(true) - k - 30:len(true) - k]
    sp.partial_bw = (dna.revcomp_codes(bw_path), 30, 0.9)
    assert corr._merge_partials(sp)
    # fw wins; merged sequence = fw + bw remainder + anchor, all true bases
    np.testing.assert_array_equal(sp.seq[:80], true[:80])
    assert sp.ok
