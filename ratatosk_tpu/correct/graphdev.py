"""Device-resident view of the colored cDBG for the correction hot path.

Bundles exactly the arrays the beam engine touches every step: the flat 2-bit
unitig catalog, the support-masked successor table, and the hashed color
signatures. Everything else (color rows, the k-mer index) stays host-side —
device arrays cost HBM, upload time, and jit-signature churn.

Two deliberate shape decisions:
- edge read-support (UnitigData.shared_pids, Graph.cpp:2003) is folded into
  the successor table at build time (unsupported edge => -1), removing one
  [R, B, 4] gather per beam step;
- every array is padded to power-of-2 length buckets so jit signatures (and
  the persistent compilation cache) are stable across passes, datasets and
  distributed chunks — without padding every graph recompiles every kernel.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ratatosk_tpu.graph.build import Cdbg
from ratatosk_tpu.graph.colors import GraphColors
from ratatosk_tpu.ops import colorset as CS


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DeviceGraph:
    # k rides as a TRACED scalar (not static aux): the beam kernels then
    # compile once per SHAPE class, shared across passes (k=31 and k=63) and
    # datasets — cold warmup halves and a toy graph can pre-warm the cache
    # for a multi-Mbp run
    kval: jnp.ndarray         # int32 scalar
    useq: jnp.ndarray         # uint8 [total_bp] 2-bit codes
    utbl: jnp.ndarray         # int32 [N, 2, 6]: per leaving strand d the 4
                              # support-masked successors (packed v<<1|dir,
                              # -1 = absent/unsupported; bit 30 = rescued by
                              # the k2 graph, exempt from the color filter),
                              # then ulen, uoff — ONE [R, B, 6] gather per
                              # beam step (gather cost is flat in the
                              # trailing dim, so fusing the three per-unitig
                              # gathers is ~3x cheaper)
    color_sig: jnp.ndarray    # int8 [N, SIG_BINS] hashed color indicator

    def tree_flatten(self):
        children = (self.kval, self.useq, self.utbl, self.color_sig)
        return children, ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @staticmethod
    def from_host(cdbg: Cdbg, colors: GraphColors, device=None) -> "DeviceGraph":
        put = (lambda x: jax.device_put(x, device)) if device else jnp.asarray
        if cdbg.uoff[-1] >= (1 << 31):
            raise ValueError("unitig catalog exceeds int32 addressing; "
                             "shard the index (parallel/) before device upload")

        # generous pad minimums: a TOY graph then lands in the same shape
        # class as a multi-Mbp one, so warming the compile cache with a toy
        # corrector covers the real run (bench.py overlaps it with the
        # untimed index build)
        def pad_n(x, fill, min_size=1 << 14):
            x = np.asarray(x)
            n2 = max(min_size, 1 << int(np.ceil(np.log2(max(len(x), 1)))))
            if n2 == len(x):
                return x
            out = np.full((n2,) + x.shape[1:], fill, dtype=x.dtype)
            out[:len(x)] = x
            return out

        n = cdbg.n_unitigs
        edges_sup = np.where(colors.edge_support, cdbg.edges, -1)
        if colors.edge_rescued is not None:
            edges_sup = np.where((edges_sup >= 0) & colors.edge_rescued,
                                 edges_sup | (1 << 30), edges_sup)
        utbl = np.empty((n, 2, 6), dtype=np.int32)
        utbl[:, :, :4] = edges_sup
        utbl[:, :, 4] = cdbg.ulen.astype(np.int32)[:, None]
        utbl[:, :, 5] = cdbg.uoff[:-1].astype(np.int32)[:, None]
        utbl_p = pad_n(utbl, -1)
        utbl_p[n:, :, 4:] = 0      # padded rows: no successors, empty unitig
        return DeviceGraph(
            kval=jnp.int32(cdbg.k),
            useq=put(pad_n(cdbg.useq, 0, min_size=1 << 22)),
            utbl=put(utbl_p),
            color_sig=put(pad_n(CS.color_signature(colors.rows), 0)),
        )
