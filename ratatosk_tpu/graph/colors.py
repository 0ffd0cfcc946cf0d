"""Graph coloring: map short reads onto unitigs, build color sets + coverage.

Re-expresses the reference's `addCoverage` anchoring/coloring phases
(Graph.cpp:1561-3366, SURVEY.md §2.2(3)) as sort/scatter passes — no
lock-striped graph writes (`LockGraph`, Graph.cpp:1599-1667): read->unitig
hits become (unitig, read_id) pairs, deduplicated and segment-reduced.

Color sets are padded sorted rows (ops/colorset.py) capped at
max_cov_vertices=128 (Common.hpp:128 — the reference's disk-spill threshold);
true cardinality is kept separately. Edge support mirrors UnitigData's
shared_pids bits (UnitigData.hpp:577): edge (u,v) is read-supported iff
|colors(u) ∩ colors(v)| >= min_cov_vertices (Graph.cpp:2003,2015).
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, Optional, Sequence

import numpy as np

from ratatosk_tpu.graph.build import Cdbg
from ratatosk_tpu.graph.keys import KeyArray
from ratatosk_tpu.ops import colorset as CS


@dataclasses.dataclass
class GraphColors:
    cap: int
    rows: np.ndarray          # [N, cap] int32 sorted read ids, PAD padded
    card: np.ndarray          # [N] int32 true color cardinality
    coverage: np.ndarray      # [N] int64 mapped k-mer count (unphased cov)
    edge_support: np.ndarray  # [N, 2, 4] bool
    n_colors: int             # number of distinct read ids


def map_reads_to_unitigs(cdbg: Cdbg, reads: Sequence[np.ndarray]):
    """For each read, the unitig row hit per k-mer position (-1 = miss).

    Returns list of int64 arrays (index rows), one per read.
    """
    keys = KeyArray(cdbg.k, np.asarray(cdbg.index.keys_lo),
                    np.asarray(cdbg.index.keys_hi) if cdbg.index.two_word else None)
    out = []
    for codes in reads:
        if codes.shape[-1] < cdbg.k:
            out.append(np.full(0, -1, dtype=np.int64))
            continue
        ka, valid = KeyArray.from_codes(codes, cdbg.k)
        can, _ = ka.canonical()
        rows = keys.find(can)
        rows[~valid] = -1
        out.append(rows)
    return out


def color_graph(cdbg: Cdbg, reads: Iterable[np.ndarray],
                read_ids: Optional[Sequence[int]] = None,
                cap: int = 128, min_cov_edge: int = 2,
                sampling_rate: float = 1.0,
                chunk_pairs: int = 1 << 22) -> GraphColors:
    """Stream reads, build color rows + coverage + edge support.

    read_ids: color id per read (paired reads share one id, matching the
    reference's paired-read ID sets); defaults to the read's ordinal.
    sampling_rate < 1 drops color ids Bernoulli-style (reference `-S`,
    Graph.cpp:2117-2127) — deterministically by id hash, so distributed
    replicas agree. Coverage still counts every read.
    """
    n = cdbg.n_unitigs
    cov = np.zeros(n, dtype=np.int64)
    iuid = np.asarray(cdbg.index.unitig_id)
    pair_chunks = []
    rid_iter = iter(read_ids) if read_ids is not None else None
    max_rid = -1
    for i, codes in enumerate(reads):
        rid = next(rid_iter) if rid_iter is not None else i
        max_rid = max(max_rid, rid)
        if codes.shape[-1] < cdbg.k:
            continue
        ka, valid = KeyArray.from_codes(codes, cdbg.k)
        sel = np.flatnonzero(valid)
        if sel.size == 0:
            continue
        can, _ = ka.take(sel).canonical()
        keys = KeyArray(cdbg.k, np.asarray(cdbg.index.keys_lo),
                        np.asarray(cdbg.index.keys_hi) if cdbg.index.two_word else None)
        rows = keys.find(can)
        hit = rows >= 0
        uids = iuid[rows[hit]].astype(np.int64)
        np.add.at(cov, uids, 1)
        uu = np.unique(uids)
        pair_chunks.append((uu << 32) | np.int64(rid))
    n_colors = max_rid + 1
    if pair_chunks:
        combo = np.unique(np.concatenate(pair_chunks))
    else:
        combo = np.zeros(0, dtype=np.int64)
    if sampling_rate < 1.0 and combo.size:
        from ratatosk_tpu.ops import kmers as K
        rid_all = (combo & np.int64(0xFFFFFFFF)).astype(np.uint64)
        keep_p = K.splitmix64(rid_all, np) < np.uint64(
            int(sampling_rate * float(2**64 - 1)))
        combo = combo[keep_p]
    uid_of = (combo >> 32).astype(np.int64)
    rid_of = (combo & np.int64(0xFFFFFFFF)).astype(np.int32)
    card = np.bincount(uid_of, minlength=n).astype(np.int32)
    rows = np.full((n, cap), CS.PAD, dtype=np.int32)
    if combo.size:
        # rank within each unitig segment; ids are sorted so rows come out sorted
        starts_mask = np.empty(combo.size, dtype=bool)
        starts_mask[0] = True
        starts_mask[1:] = uid_of[1:] != uid_of[:-1]
        seg_start = np.maximum.accumulate(np.where(starts_mask, np.arange(combo.size), 0))
        rank = np.arange(combo.size) - seg_start
        keep = rank < cap
        rows[uid_of[keep], rank[keep]] = rid_of[keep]
    edge_support = _edge_support(cdbg, rows, min_cov_edge)
    return GraphColors(cap=cap, rows=rows, card=card, coverage=cov,
                       edge_support=edge_support, n_colors=n_colors)


def _edge_support(cdbg: Cdbg, rows: np.ndarray, min_cov: int,
                  chunk: int = 1 << 16) -> np.ndarray:
    n = cdbg.n_unitigs
    support = np.zeros((n, 2, 4), dtype=bool)
    flat = cdbg.edges.reshape(-1)
    slots = np.flatnonzero(flat >= 0)
    us = slots // 8
    vs = (flat[slots] >> 1).astype(np.int64)
    for s in range(0, slots.size, chunk):
        sl = slice(s, s + chunk)
        cnt = CS.intersect_count(rows[us[sl]], rows[vs[sl]], np)
        support.reshape(-1)[slots[sl]] = cnt >= min_cov
    return support
