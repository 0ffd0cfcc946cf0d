"""Graph coloring: map short reads onto unitigs, build color sets + coverage.

Re-expresses the reference's `addCoverage` anchoring/coloring phases
(Graph.cpp:1561-3366, SURVEY.md §2.2(3)) as sort/scatter passes — no
lock-striped graph writes (`LockGraph`, Graph.cpp:1599-1667): read->unitig
hits become (unitig, read_id) pairs, deduplicated and segment-reduced.

Scale properties (the disk-spill/merge role of Graph.cpp:803-867,1911-1958):
reads stream through in ~chunk_bp batches — each batch is ONE packed
canonicalization + ONE sorted-index probe for every k-mer of every read in
the batch — and the accumulated pair set is kept as a single sorted-unique
array that is merged once per batch, so peak memory is O(unique pairs +
batch), never O(all hits).

Coverage-stratified subsampling (Graph.cpp:2312-2871): when the estimated
per-haplotype coverage is high, read colors are downsampled by a
deterministic per-read-id hash with a keep rate derived from the coverage
decile of the read's canonical (first-hit) unitig, keeping >= keep_min reads
per unitig; surviving ids are compacted to a dense range.

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
from ratatosk_tpu.ops import kmers as K


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


def _probe_chunk(cdbg: Cdbg, keys: KeyArray, chunk_reads, chunk_rids,
                 cov: np.ndarray):
    """One batched probe of a read chunk. Returns (pairs sorted-unique int64
    (uid<<32|rid), first-hit uid per read int64 [n], rids int64 [n])."""
    k = cdbg.k
    parts, starts = [], []
    off = 0
    sep = np.array([4], np.uint8)
    for codes in chunk_reads:
        starts.append(off)
        parts.append(np.asarray(codes, dtype=np.uint8))
        parts.append(sep)
        off += len(codes) + 1
    concat = np.concatenate(parts)
    starts_arr = np.asarray(starts, np.int64)
    first_uid = np.full(len(chunk_reads), -1, dtype=np.int64)
    from ratatosk_tpu.ops import native_kmers as NK
    if NK.available():
        rows_all, _ = NK.lookup(concat, k, keys.lo, keys.hi)
        sel = np.flatnonzero(rows_all >= 0)
        if sel.size == 0:
            return np.zeros(0, np.int64), first_uid
        rowh = rows_all[sel]
        gpos = sel
    else:
        ka, valid = KeyArray.from_codes(concat, k)
        sel = np.flatnonzero(valid)
        if sel.size == 0:
            return np.zeros(0, np.int64), first_uid
        can, _ = ka.take(sel).canonical()
        rows = keys.find(can)
        hit = rows >= 0
        if not hit.any():
            return np.zeros(0, np.int64), first_uid
        rowh = rows[hit]
        gpos = sel[hit]
    iuid = np.asarray(cdbg.index.unitig_id)
    uids = iuid[rowh].astype(np.int64)
    # coverage via bincount (np.add.at is orders slower at this volume)
    cov += np.bincount(uids, minlength=len(cov)).astype(cov.dtype)
    ridx = np.searchsorted(starts_arr, gpos, side="right") - 1
    # first hit per read = canonical unitig (anchoring phase pick,
    # Graph.cpp:1682-1691); gpos ascends, so ridx is non-decreasing and the
    # first entry of each ridx run is the read's first hit
    fnew = np.concatenate([[True], ridx[1:] != ridx[:-1]])
    first_uid[ridx[fnew]] = uids[fnew]
    rid_arr = np.asarray(chunk_rids, np.int64)[ridx]
    pairs = np.unique((uids << 32) | rid_arr)
    return pairs, first_uid


def _merge_unique(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if a.size == 0:
        return b
    if b.size == 0:
        return a
    out = np.empty(a.size + b.size, dtype=np.int64)
    np.concatenate([a, b], out=out)
    out.sort(kind="stable")
    keep = np.empty(out.size, bool)
    keep[0] = True
    np.not_equal(out[1:], out[:-1], out=keep[1:])
    return out[keep]


def subsample_colors(combo: np.ndarray, first_uid_of_read: dict,
                     cov_per_kmer: np.ndarray, *, target_cov: float = 5.0,
                     min_est_cov: float = 10.0, keep_min: int = 2):
    """Coverage-stratified color subsampling (Graph.cpp:2312-2871).

    combo: sorted-unique (uid<<32|rid) pairs. Reads are kept with a
    deterministic hash test whose rate is derived from the coverage decile of
    their canonical (first-hit) unitig; unitigs left with < keep_min colors
    get their keep_min smallest-hash reads restored. Returns (combo',
    id_remap dict old->new, n_colors) — surviving ids compacted to a dense
    range (Graph.cpp:2583-2643).
    """
    if combo.size == 0:
        return combo, None, 0
    est = float(np.median(cov_per_kmer[cov_per_kmer > 0])) if \
        (cov_per_kmer > 0).any() else 0.0
    if est < min_est_cov:
        return combo, None, int(np.unique(combo & 0xFFFFFFFF).size)
    rids = (combo & 0xFFFFFFFF).astype(np.uint64)
    uids = (combo >> 32).astype(np.int64)
    # per-read keep rate from its canonical unitig's coverage decile
    all_rids = np.unique(rids).astype(np.int64)
    r_uid = np.array([first_uid_of_read.get(int(r), -1) for r in all_rids],
                     dtype=np.int64)
    r_cov = np.where(r_uid >= 0, cov_per_kmer[np.maximum(r_uid, 0)], est)
    rate = np.minimum(target_cov / np.maximum(r_cov, 1e-9), 1.0)
    h = K.splitmix64(all_rids.astype(np.uint64), np)
    keep_read = h < (rate * float(2**64 - 1)).astype(np.uint64)
    keep_set = np.zeros(int(all_rids.max()) + 1, bool)
    keep_set[all_rids[keep_read]] = True
    keep = keep_set[rids.astype(np.int64)]
    # restore >= keep_min reads per unitig (smallest hash wins — deterministic)
    hp = K.splitmix64(rids, np)
    order = np.lexsort((hp, uids))
    u_o, h_o, k_o = uids[order], hp[order], keep[order]
    gnew = np.concatenate([[True], u_o[1:] != u_o[:-1]])
    gid = np.cumsum(gnew) - 1
    kept_per_u = np.bincount(gid, weights=k_o.astype(np.float64))
    rank = np.arange(len(u_o)) - np.repeat(np.flatnonzero(gnew),
                                           np.diff(np.append(np.flatnonzero(gnew), len(u_o))))
    restore = (kept_per_u[gid] < keep_min) & (rank < keep_min)
    k_o = k_o | restore
    keep2 = np.zeros_like(keep)
    keep2[order] = k_o
    combo2 = combo[keep2]
    old_ids = np.unique(combo2 & 0xFFFFFFFF)
    remap = {int(o): i for i, o in enumerate(old_ids)}
    new_rid = np.searchsorted(old_ids, combo2 & 0xFFFFFFFF)
    combo2 = ((combo2 >> 32) << 32) | new_rid
    combo2 = np.unique(combo2)
    return combo2, remap, int(old_ids.size)


def color_graph(cdbg: Cdbg, reads: Iterable[np.ndarray],
                read_ids: Optional[Sequence[int]] = None,
                cap: int = 128, min_cov_edge: int = 2,
                sampling_rate: float = 1.0,
                chunk_bp: int = 1 << 22,
                auto_subsample: bool = False,
                target_cov: float = 5.0) -> GraphColors:
    """Stream reads, build color rows + coverage + edge support.

    read_ids: color id per read (paired reads share one id, matching the
    reference's paired-read ID sets); defaults to the read's ordinal.
    sampling_rate < 1 drops color ids Bernoulli-style (reference `-S`,
    Graph.cpp:2117-2127) — deterministically by id hash, so distributed
    replicas agree. auto_subsample additionally applies coverage-stratified
    subsampling when estimated coverage >= 10 (addCoverage phase 5).
    Coverage still counts every read.
    """
    n = cdbg.n_unitigs
    cov = np.zeros(n, dtype=np.int64)
    keys = KeyArray(cdbg.k, np.asarray(cdbg.index.keys_lo),
                    np.asarray(cdbg.index.keys_hi) if cdbg.index.two_word else None)
    combo = np.zeros(0, dtype=np.int64)
    first_uid_of_read: dict = {}
    chunk_reads: list = []
    chunk_rids: list = []
    bp = 0
    rid_iter = iter(read_ids) if read_ids is not None else None
    max_rid = -1

    def flush():
        nonlocal combo, bp
        if not chunk_reads:
            return
        pairs, first_uid = _probe_chunk(cdbg, keys, chunk_reads, chunk_rids, cov)
        for r, u in zip(chunk_rids, first_uid):
            if u >= 0 and r not in first_uid_of_read:
                first_uid_of_read[r] = int(u)
        combo = _merge_unique(combo, pairs)
        chunk_reads.clear()
        chunk_rids.clear()
        bp = 0

    for i, codes in enumerate(reads):
        rid = next(rid_iter) if rid_iter is not None else i
        max_rid = max(max_rid, rid)
        if codes.shape[-1] < cdbg.k:
            continue
        chunk_reads.append(codes)
        chunk_rids.append(rid)
        bp += len(codes)
        if bp >= chunk_bp:
            flush()
    flush()

    n_colors = max_rid + 1
    if sampling_rate < 1.0 and combo.size:
        rid_all = (combo & np.int64(0xFFFFFFFF)).astype(np.uint64)
        keep_p = K.splitmix64(rid_all, np) < np.uint64(
            int(sampling_rate * float(2**64 - 1)))
        combo = combo[keep_p]
    # edge support comes from the FULL color sets: the reference computes the
    # sharedPids edge bits (phase 4) BEFORE subsampling (phase 5) — the hard
    # topology filter must not thin out with the stored colors
    edge_support = _edge_support_from_pairs(cdbg, combo, cap, min_cov_edge)
    if auto_subsample and combo.size:
        cov_per_kmer = cov / np.maximum(cdbg.nkmers, 1)
        combo, remap, n_new = subsample_colors(
            combo, first_uid_of_read, cov_per_kmer, target_cov=target_cov)
        if remap is not None:
            n_colors = n_new

    rows, card = _rows_from_pairs(combo, n, cap)
    return GraphColors(cap=cap, rows=rows, card=card, coverage=cov,
                       edge_support=edge_support, n_colors=n_colors)


def _rows_from_pairs(combo: np.ndarray, n: int, cap: int):
    """Sorted-unique (uid<<32|rid) pairs -> padded rows + cardinality."""
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
    return rows, card


def _edge_support_from_pairs(cdbg: Cdbg, combo: np.ndarray, cap: int,
                             min_cov: int, chunk: int = 1 << 14) -> np.ndarray:
    """Edge support from the pair CSR without materializing all rows at
    once: per edge chunk, only the endpoint unitigs' rows are built."""
    n = cdbg.n_unitigs
    support = np.zeros((n, 2, 4), dtype=bool)
    flat = cdbg.edges.reshape(-1)
    slots = np.flatnonzero(flat >= 0)
    if slots.size == 0 or combo.size == 0:
        return support
    us = (slots // 8).astype(np.int64)
    vs = (flat[slots] >> 1).astype(np.int64)
    uid_of = (combo >> 32).astype(np.int64)
    rid_of = (combo & np.int64(0xFFFFFFFF)).astype(np.int32)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.bincount(uid_of, minlength=n), out=offsets[1:])

    def rows_of(uids):
        out = np.full((len(uids), cap), CS.PAD, dtype=np.int32)
        a = offsets[uids]
        ln = np.minimum(offsets[uids + 1] - a, cap)
        tot = int(ln.sum())
        if tot:
            row_idx = np.repeat(np.arange(len(uids)), ln)
            within = np.arange(tot) - np.repeat(np.cumsum(ln) - ln, ln)
            out[row_idx, within] = rid_of[np.repeat(a, ln) + within]
        return out

    for s in range(0, slots.size, chunk):
        sl = slice(s, s + chunk)
        cnt = CS.intersect_count(rows_of(us[sl]), rows_of(vs[sl]), np)
        support.reshape(-1)[slots[sl]] = cnt >= min_cov
    return support


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
