"""Device-resident view of the colored cDBG for the correction hot path.

Bundles the arrays the beam engine gathers from every step: the flat 2-bit
unitig catalog, successor/support tables, color rows, and the k-mer index.
Everything is a plain jnp array so the whole structure jits/shards cleanly
(replicated per device first — the reference replicates its index per node,
Ratatosk.nf:280).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ratatosk_tpu.graph.build import Cdbg
from ratatosk_tpu.graph.colors import GraphColors
from ratatosk_tpu.ops import colorset as CS
from ratatosk_tpu.ops.kmer_index import KmerIndex


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DeviceGraph:
    k: int                    # static
    color_cap: int            # static
    useq: jnp.ndarray         # uint8 [total_bp] 2-bit codes
    uoff: jnp.ndarray         # int64 [N+1]
    ulen: jnp.ndarray         # int32 [N]
    edges: jnp.ndarray        # int32 [N, 2, 4] packed (v<<1|dir) or -1
    edge_support: jnp.ndarray # bool [N, 2, 4]
    color_rows: jnp.ndarray   # int32 [N, cap] sorted, PAD padded
    color_sig: jnp.ndarray    # int8 [N, SIG_BINS] hashed color indicator
    color_card: jnp.ndarray   # int32 [N]
    coverage: jnp.ndarray     # int64 [N]
    keys_lo: jnp.ndarray      # uint64 [M]
    keys_hi: jnp.ndarray | None
    kidx_uid: jnp.ndarray     # int32 [M]
    kidx_pos: jnp.ndarray     # int32 [M]
    kidx_strand: jnp.ndarray  # bool [M]

    def tree_flatten(self):
        children = (self.useq, self.uoff, self.ulen, self.edges,
                    self.edge_support, self.color_rows, self.color_sig,
                    self.color_card,
                    self.coverage, self.keys_lo, self.keys_hi,
                    self.kidx_uid, self.kidx_pos, self.kidx_strand)
        return children, (self.k, self.color_cap)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux[0], aux[1], *children)

    @property
    def index(self) -> KmerIndex:
        return KmerIndex(self.k, self.keys_lo, self.keys_hi,
                         self.kidx_uid, self.kidx_pos, self.kidx_strand)

    @staticmethod
    def from_host(cdbg: Cdbg, colors: GraphColors, device=None) -> "DeviceGraph":
        put = (lambda x: jax.device_put(x, device)) if device else jnp.asarray
        if cdbg.uoff[-1] >= (1 << 31):
            raise ValueError("unitig catalog exceeds int32 addressing; "
                             "shard the index (parallel/) before device upload")
        return DeviceGraph(
            k=cdbg.k,
            color_cap=colors.cap,
            useq=put(cdbg.useq),
            uoff=put(cdbg.uoff.astype(np.int32)),
            ulen=put(cdbg.ulen.astype(np.int32)),
            edges=put(cdbg.edges),
            edge_support=put(colors.edge_support),
            color_rows=put(colors.rows),
            color_sig=put(CS.color_signature(colors.rows)),
            color_card=put(colors.card),
            coverage=put(colors.coverage),
            keys_lo=put(np.asarray(cdbg.index.keys_lo)),
            keys_hi=None if not cdbg.index.two_word else put(np.asarray(cdbg.index.keys_hi)),
            kidx_uid=put(np.asarray(cdbg.index.unitig_id)),
            kidx_pos=put(np.asarray(cdbg.index.pos)),
            kidx_strand=put(np.asarray(cdbg.index.strand)),
        )


def oriented_base(g: DeviceGraph, uid, direction, off):
    """Base `off` of unitig `uid` read in `direction` (0 fw, 1 rc). Batched."""
    ul = g.ulen[uid]
    pos = jnp.where(direction == 0, off, ul - 1 - off)
    base = g.useq[g.uoff[uid] + pos.astype(g.uoff.dtype)].astype(jnp.int32)
    return jnp.where(direction == 0, base, 3 - base)
