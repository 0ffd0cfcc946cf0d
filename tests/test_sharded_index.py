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
