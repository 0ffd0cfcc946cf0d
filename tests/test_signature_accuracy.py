"""Hashed color-signature accuracy vs exact intersections (VERDICT r2 #7/9).

The beam's edge filter and color score use SIG_BINS-bin hashed indicator
signatures (ops/colorset.color_signature); intersection cardinality is a dot
product. These are approximate: ids colliding into one bin undercount, and
unrelated sets overlap bins with ~|A||B|/bins expectation (overcount). This
test quantifies both against exact set intersections at the production
operating point (cap=128 rows, 512 bins) and pins the false-support rate —
the probability that two sets sharing <2 reads LOOK like they share >=2 (the
min_cov edge/branch filter's failure mode).
"""

import numpy as np

from ratatosk_tpu.ops import colorset as CS


def _rand_rows(rng, n_rows, card, universe, cap=128):
    rows = np.full((n_rows, cap), CS.PAD, dtype=np.int32)
    for i in range(n_rows):
        ids = rng.choice(universe, size=card, replace=False).astype(np.int32)
        ids.sort()
        rows[i, :card] = ids
    return rows


def test_signature_counts_track_exact_intersections():
    rng = np.random.default_rng(42)
    universe = 100_000
    for card, shared in [(16, 8), (64, 16), (128, 32), (128, 128)]:
        common = rng.choice(universe, size=shared, replace=False)
        rest = np.setdiff1d(np.arange(universe), common)
        n = 200
        a = np.full((n, 128), CS.PAD, np.int32)
        b = np.full((n, 128), CS.PAD, np.int32)
        for i in range(n):
            ra = np.concatenate([common, rng.choice(rest, card - shared,
                                                    replace=False)])
            rb = np.concatenate([common, rng.choice(rest, card - shared,
                                                    replace=False)])
            a[i, :card] = np.sort(ra)
            b[i, :card] = np.sort(rb)
        exact = CS.intersect_count(a, b, np)
        sig = CS.intersect_count_sig(CS.color_signature(a),
                                     CS.color_signature(b), np)
        err = np.abs(sig - exact).astype(np.float64)
        # expected collision noise ~ card^2/bins; allow 3x slack
        bound = 3 * max(card * card / CS.SIG_BINS, 2.0)
        assert err.mean() <= bound, (card, shared, err.mean(), bound)
        # the signature never UNDERCOUNTS a true intersection by more than
        # the same-bin collisions of the shared ids themselves
        assert (sig >= exact - max(shared * shared / CS.SIG_BINS, 1) * 3).all()


def test_false_support_rate_at_min_cov():
    """Raw signature dots fake >= min_cov support for unrelated sets at high
    cardinality (measured ~56% at card 32, ~100% at card 128); the beam's
    collision-bias-corrected estimator (dot - pop_a*pop_b/bins, beam.py)
    must cut the false-support rate dramatically."""
    rng = np.random.default_rng(43)
    universe = 100_000
    n = 2000
    H = CS.SIG_BINS
    for card, raw_bound, corr_bound in ((32, 0.75, 0.15), (128, 1.01, 0.55)):
        a = _rand_rows(rng, n, card, universe)
        b = _rand_rows(rng, n, card, universe)
        exact = CS.intersect_count(a, b, np)
        sa, sb = CS.color_signature(a), CS.color_signature(b)
        sig = CS.intersect_count_sig(sa, sb, np)
        corr = sig - sa.sum(-1).astype(np.float64) * sb.sum(-1) / H
        truly_low = exact < 2
        raw_rate = ((sig >= 2) & truly_low).sum() / max(truly_low.sum(), 1)
        corr_rate = ((corr >= 2) & truly_low).sum() / max(truly_low.sum(), 1)
        assert raw_rate <= raw_bound, (card, raw_rate)
        assert corr_rate <= corr_bound, (card, corr_rate)
        assert corr_rate < raw_rate or raw_rate < 0.05, (card, corr_rate,
                                                         raw_rate)

    # weighted signatures: weights survive the max-on-collision writeback
    rows = _rand_rows(rng, 100, 64, universe)
    w = np.full(rows.shape, 3, np.int8)
    wsig = CS.color_signature(rows, weights=w)
    assert wsig.max() == 3
    plain = CS.color_signature(rows)
    assert ((wsig > 0) == (plain > 0)).all()
