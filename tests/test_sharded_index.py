"""Sharded k-mer index lookups must equal the single-device index."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ratatosk_tpu.graph import build as B
from ratatosk_tpu.graph.keys import KeyArray
from ratatosk_tpu.ops import kmer_index as KI
from ratatosk_tpu.parallel import mesh as M
from ratatosk_tpu.parallel.sharded_index import ShardedKmerIndex
from tests import sim

K = 21


def test_sharded_corrector_mode_matches_replicated():
    """Corrector with mesh + shard_index_min_keys=0 routes anchor lookups
    through the range-partitioned index; corrected output is bit-identical to
    the replicated-index corrector."""
    import numpy as np
    from ratatosk_tpu import testing
    from ratatosk_tpu.config import CorrectOpt
    from ratatosk_tpu.correct.engine import Corrector
    from ratatosk_tpu.parallel.mesh import make_mesh
    rng = np.random.default_rng(77)
    genome, base = testing.build_toy_corrector(seed=77, glen=8000, k=17)
    opt = CorrectOpt(small_k=17, k=63, beam_width=8, batch_regions=32,
                     shard_index_min_keys=0)
    mesh = make_mesh(8)
    sharded = Corrector(base.cdbg, base.colors, opt, mesh=mesh)
    assert sharded.sharded is not None
    plain = Corrector(base.cdbg, base.colors, opt)
    reads = [testing.noisy_read(rng, genome, 200 + 900 * i, 1500, err=0.08)[0]
             for i in range(3)]
    out_s = sharded.correct_batch(reads)
    out_p = plain.correct_batch(reads)
    for a, b in zip(out_s, out_p):
        np.testing.assert_array_equal(a.codes, b.codes)
        np.testing.assert_array_equal(a.qual, b.qual)


def test_sharded_lookup_matches_replicated():
    rng = np.random.default_rng(800)
    genome = sim.random_genome(rng, 20000)
    cdbg = B.build_cdbg([genome], K, min_count=1)
    mesh = M.make_mesh(8)
    sidx = ShardedKmerIndex(cdbg.index, mesh)

    # queries: a mix of present k-mers and random absent ones
    read = genome[3000:5000]
    ka, _ = KeyArray.from_codes(read, K)
    can, _ = ka.canonical()
    absent = np.random.default_rng(1).integers(
        0, 2 ** (2 * K), size=500).astype(np.uint64)
    queries = np.concatenate([can.lo, absent])

    uid, pos, strand = sidx.lookup(jnp.asarray(queries))
    rows = KI.lookup(cdbg.index.to_device(), jnp.asarray(queries))
    rows = np.asarray(rows)
    hit = rows >= 0
    np.testing.assert_array_equal(np.asarray(uid) >= 0, hit)
    np.testing.assert_array_equal(np.asarray(uid)[hit],
                                  np.asarray(cdbg.index.unitig_id)[rows[hit]])
    np.testing.assert_array_equal(np.asarray(pos)[hit],
                                  np.asarray(cdbg.index.pos)[rows[hit]])
    np.testing.assert_array_equal(
        np.asarray(strand)[hit],
        np.asarray(cdbg.index.strand)[rows[hit]].astype(np.int32))


def test_sharded_lookup_two_word_k63():
    """k=63 (two-word keys) shards the same way — the pass-2 index is the
    one that actually outgrows a single chip's HBM."""
    rng = np.random.default_rng(801)
    genome = sim.random_genome(rng, 20000)
    cdbg = B.build_cdbg([genome], 63, min_count=1)
    assert cdbg.index.two_word
    mesh = M.make_mesh(8)
    sidx = ShardedKmerIndex(cdbg.index, mesh)

    read = genome[3000:5000]
    ka, _ = KeyArray.from_codes(read, 63)
    can, _ = ka.canonical()
    rng2 = np.random.default_rng(2)
    absent_lo = rng2.integers(0, 2 ** 63, size=300).astype(np.uint64)
    absent_hi = rng2.integers(0, 2 ** 61, size=300).astype(np.uint64)
    q_lo = np.concatenate([can.lo, absent_lo])
    q_hi = np.concatenate([can.hi, absent_hi])

    uid, pos, strand = sidx.lookup(jnp.asarray(q_lo), jnp.asarray(q_hi))
    rows = KI.lookup(cdbg.index.to_device(), jnp.asarray(q_lo),
                     jnp.asarray(q_hi))
    rows = np.asarray(rows)
    hit = rows >= 0
    assert hit.sum() >= len(can.lo) - 1
    np.testing.assert_array_equal(np.asarray(uid) >= 0, hit)
    np.testing.assert_array_equal(np.asarray(uid)[hit],
                                  np.asarray(cdbg.index.unitig_id)[rows[hit]])
    np.testing.assert_array_equal(np.asarray(pos)[hit],
                                  np.asarray(cdbg.index.pos)[rows[hit]])
