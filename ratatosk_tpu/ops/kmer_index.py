"""Device-resident k-mer -> unitig lookup: sorted keys + branchless binary search.

Replaces Bifrost's minimizer-indexed hash table (`CompactedDBG::find`,
`findUnitig`, `searchSequence(exact)` — SURVEY.md §2.3) with a sorted canonical
key array. Lookup = log2(N) gathers inside a fori_loop, fully batched over all
query k-mers of all reads in flight; deterministic and trivially shardable
(contiguous key ranges per device).

Keys are canonical k-mers: one uint64 word for k<=32, two (hi, lo) for k<=64.
Payload per key: (unitig_id, pos, strand) — position of the k-mer on its unitig
and whether the canonical form equals the unitig-forward k-mer at that position.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class KmerIndex:
    """Sorted canonical-k-mer index. Arrays may be numpy (host) or jax (device)."""

    k: int
    keys_lo: jnp.ndarray            # [N] uint64 (the only word when k<=32)
    keys_hi: Optional[jnp.ndarray]  # [N] uint64 or None
    unitig_id: jnp.ndarray          # [N] int32
    pos: jnp.ndarray                # [N] int32, k-mer offset on the unitig
    strand: jnp.ndarray             # [N] bool, canonical == forward k-mer at pos

    @property
    def n(self) -> int:
        return int(self.keys_lo.shape[0])

    @property
    def two_word(self) -> bool:
        return self.keys_hi is not None

    @staticmethod
    def build(k: int, keys_lo: np.ndarray, keys_hi: Optional[np.ndarray],
              unitig_id: np.ndarray, pos: np.ndarray, strand: np.ndarray) -> "KmerIndex":
        """Sort (host-side numpy) and wrap. Keys must be unique."""
        if keys_hi is None:
            order = np.argsort(keys_lo, kind="stable")
        else:
            order = np.lexsort((keys_lo, keys_hi))
        idx = KmerIndex(
            k=k,
            keys_lo=keys_lo[order],
            keys_hi=None if keys_hi is None else keys_hi[order],
            unitig_id=unitig_id[order].astype(np.int32),
            pos=pos[order].astype(np.int32),
            strand=strand[order].astype(bool),
        )
        return idx

    def to_device(self, sharding=None) -> "KmerIndex":
        put = (lambda x: jax.device_put(x, sharding)) if sharding else jnp.asarray
        return KmerIndex(
            k=self.k,
            keys_lo=put(np.asarray(self.keys_lo)),
            keys_hi=None if self.keys_hi is None else put(np.asarray(self.keys_hi)),
            unitig_id=put(np.asarray(self.unitig_id)),
            pos=put(np.asarray(self.pos)),
            strand=put(np.asarray(self.strand)),
        )


def _lower_bound_1w(keys, q):
    """Branchless lower_bound of q (uint64 [Q]) in sorted keys (uint64 [N])."""
    n = keys.shape[0]
    steps = max(1, int(np.ceil(np.log2(n + 1))))
    lo = jnp.zeros(q.shape, dtype=jnp.int32)
    hi = jnp.full(q.shape, n, dtype=jnp.int32)

    def body(_, lh):
        lo, hi = lh
        mid = (lo + hi) >> 1
        kmid = keys[jnp.minimum(mid, n - 1)]
        go_right = kmid < q
        return jnp.where(go_right, mid + 1, lo), jnp.where(go_right, hi, mid)

    lo, hi = jax.lax.fori_loop(0, steps, body, (lo, hi))
    return lo


def _lower_bound_2w(keys_hi, keys_lo, q_hi, q_lo):
    n = keys_lo.shape[0]
    steps = max(1, int(np.ceil(np.log2(n + 1))))
    lo = jnp.zeros(q_lo.shape, dtype=jnp.int32)
    hi = jnp.full(q_lo.shape, n, dtype=jnp.int32)

    def body(_, lh):
        lo, hi = lh
        mid = (lo + hi) >> 1
        m = jnp.minimum(mid, n - 1)
        khi, klo = keys_hi[m], keys_lo[m]
        go_right = (khi < q_hi) | ((khi == q_hi) & (klo < q_lo))
        return jnp.where(go_right, mid + 1, lo), jnp.where(go_right, hi, mid)

    lo, hi = jax.lax.fori_loop(0, steps, body, (lo, hi))
    return lo


def lookup(index: KmerIndex, q_lo, q_hi=None, valid=None):
    """Find canonical-k-mer queries in the index.

    Returns int32 row indices into the index arrays, -1 where absent
    (or where `valid` is False). jit-safe; shapes follow q_lo.
    """
    keys_lo = jnp.asarray(index.keys_lo)
    if index.two_word:
        assert q_hi is not None
        keys_hi = jnp.asarray(index.keys_hi)
        pos = _lower_bound_2w(keys_hi, keys_lo, jnp.asarray(q_hi), jnp.asarray(q_lo))
        n = keys_lo.shape[0]
        safe = jnp.minimum(pos, n - 1)
        found = (pos < n) & (keys_lo[safe] == q_lo) & (keys_hi[safe] == q_hi)
    else:
        pos = _lower_bound_1w(keys_lo, jnp.asarray(q_lo))
        n = keys_lo.shape[0]
        safe = jnp.minimum(pos, n - 1)
        found = (pos < n) & (keys_lo[safe] == q_lo)
    if valid is not None:
        found = found & valid
    return jnp.where(found, safe, -1)
