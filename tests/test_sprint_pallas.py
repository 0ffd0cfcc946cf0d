"""Pallas sprint kernel vs independent oracles.

The fused VMEM kernel (ops/sprint_pallas.py) must be bit-identical to
(a) a straight-line NumPy replica of the E-transformed band update, and
(b) the XLA fori-loop fallback, end-to-end through beam_search's winner
reconstruction. Tests run the kernel in interpret mode (CPU); the compiled
path is exercised on the TPU by the bench/verify runs.
"""

import numpy as np
import jax.numpy as jnp

from ratatosk_tpu import testing
from ratatosk_tpu.correct import beam as BM
from ratatosk_tpu.correct.engine import make_region_batch
from ratatosk_tpu.ops.sprint_pallas import sprint_rows

BIG = 1 << 20


def _ref_sprint(rwin, btgt, nb, newcols, wsall, mreg, live, plen, smax):
    """NumPy oracle for the kernel's band-state evolution."""
    rwin = rwin.copy()
    btgt = btgt.copy()
    R, B, W = rwin.shape
    for r in range(R):
        for j in range(smax - 1):
            if j >= mreg[r]:
                break
            ws_n = wsall[r, j + 1]
            delta = ws_n - wsall[r, j]
            if delta == 1:
                btgt[r, :-1] = btgt[r, 1:]
                btgt[r, -1] = newcols[r, j]
            cols = ws_n + np.arange(W)
            for b in range(B):
                if not live[r, b]:
                    continue
                row = rwin[r, b]
                prev_j = np.concatenate([row[1:], [BIG]]) if delta == 1 else row
                prev_jm1 = row if delta == 1 else np.concatenate([[BIG], row[:-1]])
                sub = ((1 << nb[r, b, j]) & btgt[r]) == 0
                dd = np.minimum(prev_jm1 + sub, prev_j + 1)
                dd = np.where(cols == 0, plen[r, b] + j + 1, dd)
                dd = np.minimum(dd, BIG)
                ee = cols + np.minimum.accumulate(dd - cols)
                rwin[r, b] = np.minimum(ee, BIG)
    return rwin, btgt


def test_kernel_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    R, B, W, smax = 5, 4, 37, 8
    rwin = rng.integers(0, 200, (R, B, W)).astype(np.int32)
    btgt = (1 << rng.integers(0, 4, (R, W))).astype(np.int32)
    nb = rng.integers(0, 4, (R, B, smax - 1)).astype(np.int32)
    newcols = (1 << rng.integers(0, 4, (R, smax - 1))).astype(np.int32)
    # plausible monotone window starts (delta in {0,1} per substep)
    ws0 = rng.integers(0, 50, R)
    deltas = rng.integers(0, 2, (R, smax - 1))
    wsall = (ws0[:, None] + np.concatenate(
        [np.zeros((R, 1), int), np.cumsum(deltas, axis=1)], axis=1)
    ).astype(np.int32)
    mreg = rng.integers(0, smax, R).astype(np.int32)
    live = rng.integers(0, 2, (R, B)).astype(np.int32)
    plen = rng.integers(0, 100, (R, B)).astype(np.int32)

    got_r, got_b = sprint_rows(
        jnp.asarray(rwin), jnp.asarray(btgt), jnp.asarray(nb),
        jnp.asarray(newcols), jnp.asarray(wsall), jnp.asarray(mreg),
        jnp.asarray(live), jnp.asarray(plen), smax=smax, interpret=True,
        block_r=4)   # uneven: exercises the pad path
    want_r, want_b = _ref_sprint(rwin, btgt, nb, newcols, wsall, mreg, live,
                                 plen, smax)
    np.testing.assert_array_equal(np.asarray(got_r), want_r)
    np.testing.assert_array_equal(np.asarray(got_b), want_b)


def test_beam_search_pallas_interpret_bit_identical():
    rng = np.random.default_rng(7)
    genome, corr = testing.build_toy_corrector(seed=7, glen=20000, k=21)
    specs = testing.toy_region_specs(corr, genome, rng, 32)
    specs = [s for s in specs if len(s.tgt) <= 256][:16]
    assert len(specs) >= 4
    rb, lmax = make_region_batch(specs, 256, corr.colors.cap,
                                 r_pad=max(len(specs), 8))
    rx = BM.beam_search(corr.g, rb, beam=8, lmax=lmax, min_cov=2,
                        sprint=8, sprint_impl="xla")
    rp = BM.beam_search(corr.g, rb, beam=8, lmax=lmax, min_cov=2,
                        sprint=8, sprint_impl="pallas_interpret")
    for f in BM.BeamResult._fields:
        assert np.array_equal(np.asarray(getattr(rx, f)),
                              np.asarray(getattr(rp, f))), f
