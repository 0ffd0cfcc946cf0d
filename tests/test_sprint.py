"""Sprint-mode beam equivalence: multi-base advancement is a pure schedule
change.

Between branch points every live entry's next base is deterministic, so
advancing up to sprint-1 mid-unitig bases per outer step (beam._sprint_advance)
must reproduce the one-base-per-step search EXACTLY — same winning paths,
distances, scoreboard contents, reconstruction. The stride is capped so no
event (unitig boundary, right-anchor arrival, budget freeze) can occur inside
a sprint; events land on the branch step that follows.
"""

import numpy as np

from ratatosk_tpu import testing
from ratatosk_tpu.correct import beam as BM
from ratatosk_tpu.correct.engine import make_region_batch


def _specs(seed, k, n, nt):
    rng = np.random.default_rng(seed)
    genome, corr = testing.build_toy_corrector(seed=seed, glen=30000, k=k)
    specs = testing.toy_region_specs(corr, genome, rng, n)
    return corr, [s for s in specs if len(s.tgt) <= nt]


def test_sprint_bit_identical_exact_band():
    corr, specs = _specs(7, 21, 48, 256)
    assert len(specs) >= 16
    rb, lmax = make_region_batch(specs, 256, corr.colors.cap,
                                 r_pad=max(len(specs), 8))
    for band in (0, 64):
        r1 = BM.beam_search(corr.g, rb, beam=8, lmax=lmax, min_cov=2,
                            band=band, sprint=1)
        r8 = BM.beam_search(corr.g, rb, beam=8, lmax=lmax, min_cov=2,
                            band=band, sprint=8)
        for f in BM.BeamResult._fields:
            assert np.array_equal(np.asarray(getattr(r1, f)),
                                  np.asarray(getattr(r8, f))), (band, f)


def test_sprint_bit_identical_mirrored():
    corr, specs = _specs(13, 17, 32, 256)
    specs = [s for s in specs if s.mirror is not None]
    assert specs
    rb, lmax = make_region_batch(specs, 256, corr.colors.cap, mirrored=True,
                                 r_pad=max(len(specs), 8))
    r1 = BM.beam_search(corr.g, rb, beam=8, lmax=lmax, min_cov=2, sprint=1)
    r4 = BM.beam_search(corr.g, rb, beam=8, lmax=lmax, min_cov=2, sprint=4)
    for f in BM.BeamResult._fields:
        assert np.array_equal(np.asarray(getattr(r1, f)),
                              np.asarray(getattr(r4, f))), f
