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


def test_mixed_lengths_one_bucket(setup):
    """A short region padded into a much wider bucket must produce the same
    result as in a tight bucket: the band window clips at the REGION's tail
    (tl+1-W), not the bucket's — regression test for the shared-scalar clip
    that returned BIG captures for short regions in wide buckets."""
    corr, _, _ = setup
    rng = np.random.default_rng(78)
    genome, corr2 = testing.build_toy_corrector(seed=77, glen=20000, k=17,
                                                coverage=35)
    specs = testing.toy_region_specs(corr2, genome, rng, 120, err=0.12)
    small = [s for s in specs if 100 < len(s.tgt) <= 512][:8]
    out = {}
    for nt in (512, 2048):
        rb, lmax = make_region_batch(small, nt, corr2.colors.cap, r_pad=8)
        res = BM.beam_search(corr2.g, rb, beam=8, lmax=lmax, min_cov=2,
                             band=192)
        out[nt] = res
    np.testing.assert_array_equal(np.asarray(out[512].completed),
                                  np.asarray(out[2048].completed))
    np.testing.assert_array_equal(np.asarray(out[512].best_dist),
                                  np.asarray(out[2048].best_dist))
    np.testing.assert_array_equal(np.asarray(out[512].best_end),
                                  np.asarray(out[2048].best_end))


def test_tiny_band_still_valid(setup):
    corr, rb, lmax = setup
    res = BM.beam_search(corr.g, rb, beam=8, lmax=lmax, min_cov=2, band=48)
    # a too-narrow band may miss paths but must not corrupt results
    d = np.asarray(res.best_dist)
    ok = np.asarray(res.completed)
    n = np.asarray(rb.tgt_len)
    assert (d[ok] <= n[ok]).all()
