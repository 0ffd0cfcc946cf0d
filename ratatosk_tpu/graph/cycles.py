"""Short-repeat cycle detection.

Reference detectShortCycles (Graph.cpp:4659-4855): per-unitig BFS over
read-supported edges, total path <= 2k bp, must return to the start unitig on
the same strand with >= min_cov supporting reads on every inner unitig. The
reference stores materialized cycle strings and splices copies into candidate
paths when that lowers edit distance (fixRepeats, GraphTraversal.cpp:1149-1334).

Our beam search traverses cycles natively (no visited-set), so the annotation's
role here is (a) component parity, (b) letting the engine widen a region's
path-length budget when its anchors touch a cyclic unitig — tandem repeats can
legitimately need paths longer than the raw gap suggests.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ratatosk_tpu.graph.build import Cdbg
from ratatosk_tpu.graph.colors import GraphColors


def detect_short_cycles(cdbg: Cdbg, colors: Optional[GraphColors] = None,
                        max_len_factor: int = 2, min_cov: int = 2) -> np.ndarray:
    """bool [N]: unitig lies on a read-supported cycle of <= 2k appended bp.

    Matches the reference's bound (total path <= 2k bp, Graph.cpp:4723) and
    inner-coverage requirement (>= 2 reads per inner unitig, 4716-4720).
    """
    k = cdbg.k
    n = cdbg.n_unitigs
    max_bp = max_len_factor * k
    ulen = cdbg.ulen
    nk = cdbg.nkmers
    on_cycle = np.zeros(n, dtype=bool)
    edges = cdbg.edges
    support = colors.edge_support if colors is not None else None
    card = colors.card if colors is not None else None

    for u in range(n):
        if on_cycle[u]:
            continue
        # BFS from (u, fw) over oriented tips; appended length = k-1 overlap
        # skipped, so each edge crossing adds (nkmers of target) bp at most
        start = (u << 1) | 0
        frontier = [(start, 0)]
        seen = set()
        found = False
        while frontier and not found:
            nxt = []
            for tip, dist in frontier:
                v, d = tip >> 1, tip & 1
                for c in range(4):
                    e = edges[v, d, c]
                    if e < 0:
                        continue
                    if support is not None and not support[v, d, c]:
                        continue
                    w = e >> 1
                    if card is not None and w != u and card[w] < min_cov:
                        continue
                    nd = dist + int(nk[w])
                    if e == start:
                        found = True
                        break
                    if nd >= max_bp:
                        continue
                    if (e, min(nd, max_bp)) not in seen:
                        seen.add((e, min(nd, max_bp)))
                        nxt.append((e, nd))
                if found:
                    break
            frontier = nxt
        if found:
            on_cycle[u] = True
    return on_cycle
