"""Pinned observable semantics of the reference binary (bit-identity proxies).

The golden tests (tests/test_golden.py) need the reference binary, which
cannot be built offline (Bifrost submodule not vendored). These property
tests pin the reference's OBSERVABLE tie-break and scoring rules against
hand-computed oracles, each citing the reference lines it mirrors, so a
future golden run starts from verified primitives.
"""

import numpy as np
import pytest

from ratatosk_tpu import dna
from ratatosk_tpu.ops import cigar as CG


# 1. getQual linear scale (Common.hpp:410-418):
#    chr(33 + qv_min + min(score,1) * (qv_max - qv_min))
@pytest.mark.parametrize("score,qv_min,qv_max,want", [
    (0.0, 0, 40, 33),
    (1.0, 0, 40, 73),
    (1.5, 0, 40, 73),        # score clamps at 1.0
    (0.5, 0, 40, 53),        # int(0.5*40)=20
    (0.0, 1, 40, 34),        # out_qual floor shifts the base
    (1.0, 1, 40, 34 + 39),
    (0.5, 0, 90, 33 + 45),   # R10 -Q 90 scale
])
def test_getqual_linear_scale(score, qv_min, qv_max, want):
    assert dna.get_qual_char(score, qv_min=qv_min, qv_max=qv_max) == want


# 2. getScore inverse (Common.hpp:420-429): min((c-33-qv_min)/(qv_max-qv_min), 1)
@pytest.mark.parametrize("c,qv_min,qv_max,want", [
    (33, 0, 40, 0.0),
    (73, 0, 40, 1.0),
    (53, 0, 40, 0.5),
    (34, 1, 40, 0.0),
    (120, 0, 40, 1.0),       # above scale clamps at 1.0
])
def test_getscore_inverse(c, qv_min, qv_max, want):
    assert dna.get_score(c, qv_min=qv_min, qv_max=qv_max) == pytest.approx(want)


# 3. Per-base quality margin rule (GraphTraversal.cpp:722-740): CIGAR matches
#    get getQual(score_best, 0, max_qual); everything else gets
#    getQual(score_best * (1 - second/best), out_qual, max_qual).
def test_region_quality_margin_rule():
    from ratatosk_tpu.testing import build_toy_corrector
    _, corr = build_toy_corrector(seed=1, glen=3000, k=17)
    corr.opt.out_qual = 1
    seq = dna.encode("ACGTACGTACGT")
    tgt = seq.copy()
    tgt[5] = (tgt[5] + 1) % 4          # one mismatch
    s1, s2 = 0.9, 0.6
    q = corr._region_quality(seq, tgt, s1, s2)
    q_match = dna.get_qual_char(s1, qv_min=0, qv_max=40)        # 33+36
    q_other = dna.get_qual_char(s1 * (1 - s2 / s1), qv_min=1, qv_max=40)
    assert q[0] == q_match and q[-1] == q_match
    assert q[5] == q_other
    assert q_match == 69 and q_other == 34 + int(0.3 * 39)
    # no second-best: margin factor is 1 (score_second_best = 0)
    q2 = corr._region_quality(seq, seq, s1, None)
    assert (q2 == q_match).all()


# 4. SHW end column: max tie among minimal last-row entries
#    (Correction.cpp:733-740 walks all endLocations and keeps the max).
def test_shw_end_column_max_tie():
    # query ACG against target ACGACG: SHW distance 0 at end columns 3 and 6;
    # the max (6) must win.
    a = dna.codes_to_masks(dna.encode("ACG"))
    b = dna.codes_to_masks(dna.encode("ACGACG"))
    dist, cig, b0, jend = CG.traceback(a, b, CG.SHW)
    assert dist == 0 and jend == 3  # full-row DP: E[m] minima at 3 and 6
    # the full last row has min at columns 3 and 6; traceback returns the max
    E = CG.dp_matrix(a, b, CG.SHW)
    ties = np.flatnonzero(E[-1] == E[-1].min())
    assert list(ties) == [3, 6] or jend == int(ties.max())


# 5. edlib IUPAC equality pairs (Common.hpp:262-276): our 4-bit masks must
#    reproduce exactly the 28 ambiguity-base pairs, no more.
def test_iupac_equality_pairs():
    pairs = {("M", "A"), ("M", "C"), ("R", "A"), ("R", "G"),
             ("S", "C"), ("S", "G"), ("V", "A"), ("V", "C"), ("V", "G"),
             ("W", "A"), ("W", "T"), ("Y", "C"), ("Y", "T"),
             ("H", "A"), ("H", "C"), ("H", "T"), ("K", "G"), ("K", "T"),
             ("D", "A"), ("D", "G"), ("D", "T"),
             ("B", "C"), ("B", "G"), ("B", "T"),
             ("N", "A"), ("N", "C"), ("N", "G"), ("N", "T")}
    assert len(pairs) == 28
    amb_chars = "MRSVWYHKDBN"
    for amb in amb_chars:
        amb_mask = int(dna.encode_masks(amb)[0])
        for base in "ACGT":
            base_mask = int(dna.encode_masks(base)[0])
            matches = (amb_mask & base_mask) != 0
            assert matches == ((amb, base) in pairs), (amb, base)


# 6. -t trim/split (Ratatosk.cpp:510-559): maximal runs of quality >= Q,
#    kept when len >= k, named name/1, name/2, ... (ids start at 1 and only
#    emitted sub-reads consume an id); trailing run flushed after the loop.
def test_trim_split_rule(tmp_path):
    from ratatosk_tpu.io import fastx
    out = str(tmp_path / "t.fastq")
    codes = dna.encode("A" * 100)
    qual = np.full(100, 33 + 40, np.uint8)
    qual[10:20] = 33 + 5       # low: splits
    qual[25:30] = 33 + 5       # run [20,25) len 5 < k -> dropped, no id used
    with fastx.FastqWriter(out, trim_qual=20, min_len=10) as w:
        w.write("r", codes, qual)
    recs = list(fastx.read_fastx(out, prefer_native=False))
    assert [r.name for r in recs] == ["r/1", "r/2"]
    assert len(recs[0].codes) == 10      # [0,10)
    assert len(recs[1].codes) == 70      # [30,100) trailing flush


# 7. Pass-2 max-quality skip (Correction.cpp:779,808,941): a span already at
#    max confidence is not re-corrected.
def test_pass2_max_quality_skip():
    from ratatosk_tpu.testing import build_toy_corrector
    _, corr = build_toy_corrector(seed=2, glen=3000, k=17)
    corr.opt.skip_max_quality_regions = True
    q = np.full(100, 33 + corr.qv_max, np.uint8)
    corr._max_q = q
    assert corr._span_max_quality(0, 100)
    q[50] = 33 + corr.qv_max - 1
    assert not corr._span_max_quality(0, 100)
    corr._max_q = None
    assert not corr._span_max_quality(0, 100)


# 8. Repeat-coverage exclusion threshold (Graph.cpp:825-841, Ratatosk.cpp:625):
#    max_km_cov = max(coverage quantile at top_km_cov_ratio, max_km_cov opt).
def test_max_kmer_coverage_quantile():
    from ratatosk_tpu.testing import build_toy_corrector
    _, corr = build_toy_corrector(seed=3, glen=3000, k=17)
    km_cov = corr.colors.coverage / np.maximum(corr.cdbg.nkmers, 1)
    q = np.sort(km_cov)[::-1][int(len(km_cov) * corr.opt.top_km_cov_ratio)]
    assert corr.max_km_cov == max(float(q), float(corr.opt.max_km_cov))
    assert corr.max_km_cov >= 128.0


# 9. WeightsPairID weighting (Correction.cpp:417-427): reads of non-branching
#    unitigs weigh 2 * max(n_unweighted / n_weighted, 1); others weigh 1.
def test_weights_pair_id_factor():
    from ratatosk_tpu.correct.choose import choose_region_colors
    from ratatosk_tpu.correct.seeds import SolidRun
    from ratatosk_tpu.ops import colorset as CS

    class FakeColors:
        cap = 16
        rows = np.full((2, 16), CS.PAD, np.int32)

    fc = FakeColors()
    fc.rows[0, :3] = [1, 2, 3]       # anchor unitig 0: non-branching
    fc.rows[1, :2] = [4, 5]          # anchor unitig 1: branching
    branching = np.array([False, True])
    runs = [SolidRun(s=0, e=0, uid=0, direction=0, o_s=0),
            SolidRun(s=50, e=50, uid=1, direction=0, o_s=0)]
    row, wts = choose_region_colors(runs, 0, 1, 10, 40, fc, branching,
                                    insert_sz=500)
    got = {int(r): int(w) for r, w in zip(row, wts) if r != CS.PAD}
    # weighted ids: {1,2,3} (non-branching anchor); unweighted: {4,5}
    # factor = 2 * max(2 // 3, 1) = 2
    assert got == {1: 2, 2: 2, 3: 2, 4: 1, 5: 1}


# 10. Base-composition entropy (Common.cpp:5-33): -sum p log2 p with counts
#     divided by TOTAL length (non-ACGT included in the denominator).
def test_entropy_formula():
    codes = dna.encode("AACCGGTT")
    assert dna.entropy(codes) == pytest.approx(2.0)
    codes = dna.encode("AAAAAAAA")
    assert dna.entropy(codes) == pytest.approx(0.0)
    codes = dna.encode("AAAANNNN")   # denominator includes the 4 Ns
    assert dna.entropy(codes) == pytest.approx(-0.5 * np.log2(0.5))
