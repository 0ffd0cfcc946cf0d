"""Multi-device sharding tests on the 8-device CPU mesh."""

import numpy as np
import jax
import pytest

from ratatosk_tpu import testing
from ratatosk_tpu.correct import beam as BM
from ratatosk_tpu.correct.engine import make_region_batch
from ratatosk_tpu.parallel import mesh as M


@pytest.fixture(scope="module")
def toy():
    rng = np.random.default_rng(55)
    genome, corr = testing.build_toy_corrector(seed=55, glen=8000, k=17)
    specs = [s for s in testing.toy_region_specs(corr, genome, rng, 64)
             if len(s.tgt) <= 64]
    assert len(specs) >= 8
    rb, lmax = make_region_batch(specs[:16], 64, corr.colors.cap, r_pad=16)
    return corr, rb, lmax


def test_mesh_creation():
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    mesh = M.make_mesh(8)
    assert mesh.devices.size == 8


def test_sharded_matches_single_device(toy):
    corr, rb, lmax = toy
    single = BM.beam_search(corr.g, rb, beam=8, lmax=lmax, min_cov=2)
    mesh = M.make_mesh(8)
    sharded = M.sharded_beam_search(corr.g, rb, mesh, beam=8, lmax=lmax, min_cov=2)
    np.testing.assert_array_equal(np.asarray(single.best_dist),
                                  np.asarray(sharded.best_dist))
    np.testing.assert_array_equal(np.asarray(single.best_len),
                                  np.asarray(sharded.best_len))
    np.testing.assert_array_equal(np.asarray(single.best_seq),
                                  np.asarray(sharded.best_seq))


def test_sharded_odd_region_count(toy):
    corr, rb, lmax = toy
    rb_odd = jax.tree_util.tree_map(lambda x: x[:13], rb)
    mesh = M.make_mesh(8)
    res = M.sharded_beam_search(corr.g, rb_odd, mesh, beam=8, lmax=lmax, min_cov=2)
    assert np.asarray(res.best_dist).shape[0] == 13


def test_graft_entry_contract():
    import __graft_entry__ as GE
    fn, args = GE.entry()
    out = fn(*args)
    jax.block_until_ready(out)
    assert np.asarray(out.best_dist).shape[0] == 8
    GE.dryrun_multichip(8)
