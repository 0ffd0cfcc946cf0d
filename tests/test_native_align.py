"""Native banded aligner (native/align.cpp) vs the NumPy DP oracle."""

import numpy as np
import pytest

from ratatosk_tpu import dna
from ratatosk_tpu.ops import cigar as CG
from ratatosk_tpu.ops import native_align as NA

pytestmark = pytest.mark.skipif(not NA.available(),
                                reason="no native toolchain")


def _rand_masks(rng, n):
    return dna.codes_to_masks(rng.integers(0, 4, n).astype(np.uint8))


@pytest.mark.parametrize("mode", [CG.NW, CG.SHW, CG.HW])
def test_matches_numpy_dist_and_end(mode):
    rng = np.random.default_rng(7)
    for _ in range(120):
        a = _rand_masks(rng, int(rng.integers(0, 50)))
        b = _rand_masks(rng, int(rng.integers(0, 50)))
        d0, _, _, e0 = CG.traceback(a, b, mode)
        d1, _, e1, _, _ = NA.align(a, b, mode)
        assert d0 == d1
        assert e0 == e1


def test_banded_path_long_similar():
    """Similar long sequences exercise the narrow band + doubling."""
    rng = np.random.default_rng(3)
    for _ in range(10):
        n = int(rng.integers(400, 1200))
        ac = rng.integers(0, 4, n).astype(np.uint8)
        bc = ac.copy()
        idx = rng.integers(0, n, n // 12)
        bc[idx] = (bc[idx] + rng.integers(1, 4, len(idx))) % 4
        a, b = dna.codes_to_masks(ac), dna.codes_to_masks(bc)
        for mode in (CG.NW, CG.SHW):
            d0, _, _, e0 = CG.traceback(a, b, mode)
            d1, _, e1, _, _ = NA.align(a, b, mode)
            assert (d0, e0) == (d1, e1)


def test_qclass_and_cigar_consistent():
    rng = np.random.default_rng(11)
    for _ in range(60):
        a = _rand_masks(rng, int(rng.integers(1, 60)))
        b = _rand_masks(rng, int(rng.integers(1, 60)))
        for mode in (CG.NW, CG.SHW, CG.HW):
            d, b0, b1, qc, cig = NA.align(a, b, mode,
                                          want_qclass=True, want_cigar=True)
            # every query base consumed exactly once
            assert sum(ln for op, ln in cig if op in "=XI") == len(a)
            # qclass agrees with the cigar's query ops
            i = 0
            for op, ln in cig:
                if op in "=XI":
                    cls = {"=": 0, "X": 1, "I": 2}[op]
                    assert (qc[i:i + ln] == cls).all()
                    i += ln
            # cigar cost telescopes to the distance (within the aligned span)
            cost = sum(ln for op, ln in cig if op != "=")
            assert cost == d or mode == CG.HW


def test_iupac_masks_match_for_free():
    # N (mask 15) matches anything; R matches A/G
    r_mask = (1 << 0) | (1 << 2)  # A|G
    a = np.array([15, r_mask], dtype=np.uint8)
    b = dna.codes_to_masks(np.array([3, 2], dtype=np.uint8))  # T, G
    d, _, _, _, _ = NA.align(a, b, CG.NW)
    assert d == 0
