"""Solid-anchor detection: map a long read's k-mers onto the graph and chain
exact hits into runs.

Mirrors the reference's `getSeeds` (Graph.cpp:3-482, SURVEY.md §3.2): exact
full-k-mer matches become solid anchors; maximal colinear stretches (same
unitig, same direction, consecutive oriented offsets) form runs; adjacent runs
that share < min_cov read colors across the junction are both dropped
(Graph.cpp:325-372). Weak (inexact) seeds and pass-1 gap rescue are later-round
work.
"""

from __future__ import annotations

import dataclasses
from typing import List

import numpy as np

from ratatosk_tpu.graph.build import Cdbg
from ratatosk_tpu.graph.colors import GraphColors
from ratatosk_tpu.graph.keys import KeyArray
from ratatosk_tpu.ops import colorset as CS


@dataclasses.dataclass
class SolidRun:
    """A maximal colinear stretch of exact k-mer anchors on one unitig.

    s/e: first/last read k-mer position (inclusive); uid/direction: unitig and
    traversal direction; o_s: oriented k-mer offset on the unitig at read
    position s (oriented offset increments by 1 per read position).
    """

    s: int
    e: int
    uid: int
    direction: int
    o_s: int

    @property
    def o_e(self) -> int:
        return self.o_s + (self.e - self.s)


def find_runs(cdbg: Cdbg, codes: np.ndarray) -> List[SolidRun]:
    k = cdbg.k
    if codes.shape[-1] < k:
        return []
    ka, valid = KeyArray.from_codes(codes, k)
    can, is_fw = ka.canonical()
    keys = KeyArray(k, np.asarray(cdbg.index.keys_lo),
                    np.asarray(cdbg.index.keys_hi) if cdbg.index.two_word else None)
    rows = keys.find(can)
    rows[~valid] = -1
    hit = rows >= 0
    if not hit.any():
        return []
    uid = np.where(hit, np.asarray(cdbg.index.unitig_id)[np.maximum(rows, 0)], -1)
    pos = np.where(hit, np.asarray(cdbg.index.pos)[np.maximum(rows, 0)], 0)
    strand = np.asarray(cdbg.index.strand)[np.maximum(rows, 0)]
    # read k-mer maps forward on the unitig iff its canonical orientation
    # agrees with the stored canonical-vs-forward flag
    direction = np.where(hit & (is_fw == strand), 0, 1)
    nk = cdbg.nkmers[np.maximum(uid, 0)]
    o = np.where(direction == 0, pos, nk - 1 - pos)

    # chain: t..t+1 colinear iff same unitig+direction and oriented offset +1
    chain = (hit[:-1] & hit[1:] & (uid[:-1] == uid[1:])
             & (direction[:-1] == direction[1:]) & (o[1:] == o[:-1] + 1))
    # run starts: hit positions not chained from the left; ends: not chained
    # to the right (vectorized — the planner is host-side hot path)
    start_mask = hit.copy()
    start_mask[1:] &= ~chain
    end_mask = hit.copy()
    end_mask[:-1] &= ~chain
    starts = np.flatnonzero(start_mask)
    ends = np.flatnonzero(end_mask)
    return [SolidRun(s=int(s), e=int(e), uid=int(uid[s]),
                     direction=int(direction[s]), o_s=int(o[s]))
            for s, e in zip(starts, ends)]


def filter_runs_by_color(runs: List[SolidRun], colors: GraphColors,
                         min_cov: int = 2) -> List[SolidRun]:
    """Drop adjacent-run pairs whose unitigs share < min_cov read colors.

    The reference kills both runs of an inconsistent junction
    (Graph.cpp:325-372); single-k-mer repeat hits die here.
    """
    if len(runs) <= 1:
        return runs
    uids = np.array([r.uid for r in runs])
    lens = np.array([r.e - r.s for r in runs])
    diff = uids[:-1] != uids[1:]
    cnt = np.full(len(runs) - 1, min_cov, dtype=np.int32)
    sel = np.flatnonzero(diff)
    if sel.size:
        cnt[sel] = CS.intersect_count(colors.rows[uids[sel]],
                                      colors.rows[uids[sel + 1]], np)
    kill = np.zeros(len(runs), dtype=bool)
    bad = np.flatnonzero(diff & (cnt < min_cov))
    for i in bad:
        la, lb = lens[i], lens[i + 1]
        if la == 0 and lb > 2:
            kill[i] = True
        elif lb == 0 and la > 2:
            kill[i + 1] = True
        else:
            kill[i] = kill[i + 1] = True
    return [r for r, dead in zip(runs, kill) if not dead]
