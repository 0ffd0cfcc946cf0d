"""Banded beam must agree with the exact full-row beam on long regions."""

import numpy as np
import jax
import pytest

from ratatosk_tpu import testing
from ratatosk_tpu.correct import beam as BM
from ratatosk_tpu.correct.engine import make_region_batch


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(77)
    genome, corr = testing.build_toy_corrector(seed=77, glen=20000, k=17,
                                               coverage=35)
    specs = testing.toy_region_specs(corr, genome, rng, 120, err=0.12)
    big = [s for s in specs if 100 < len(s.tgt) <= 512]
    assert len(big) >= 4, f"need long regions, got {len(big)}"
    rb, lmax = make_region_batch(big[:8], 512, corr.colors.cap, r_pad=8)
    return corr, rb, lmax


def test_band_matches_exact(setup):
    corr, rb, lmax = setup
    exact = BM.beam_search(corr.g, rb, beam=8, lmax=lmax, min_cov=2, band=0)
    banded = BM.beam_search(corr.g, rb, beam=8, lmax=lmax, min_cov=2, band=192)
    jax.block_until_ready((exact, banded))
    # 12% error keeps drift well inside a 192-wide band: identical results
    np.testing.assert_array_equal(np.asarray(exact.completed),
                                  np.asarray(banded.completed))
    np.testing.assert_array_equal(np.asarray(exact.best_dist),
                                  np.asarray(banded.best_dist))
    np.testing.assert_array_equal(np.asarray(exact.best_len),
                                  np.asarray(banded.best_len))


def test_tiny_band_still_valid(setup):
    corr, rb, lmax = setup
    res = BM.beam_search(corr.g, rb, beam=8, lmax=lmax, min_cov=2, band=48)
    # a too-narrow band may miss paths but must not corrupt results
    d = np.asarray(res.best_dist)
    ok = np.asarray(res.completed)
    n = np.asarray(rb.tgt_len)
    assert (d[ok] <= n[ok]).all()
