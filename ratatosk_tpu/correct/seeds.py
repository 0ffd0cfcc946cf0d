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

    weak=True marks a 1-edit (inexact) seed used as a waypoint: its bases come
    from the GRAPH k-mer (the read copy carries the error); rspan is how many
    read bases the anchor window consumes (k for exact and substitution seeds,
    k+1 when the read has an extra base, k-1 when it lacks one).
    """

    s: int
    e: int
    uid: int
    direction: int
    o_s: int
    weak: bool = False
    rspan: int = 0   # 0 = default (k); engine fills the real span

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


def _variant_keys_sub(lo: np.ndarray, k: int):
    """All 1-substitution variants of packed one-word k-mers.

    lo: uint64 [P]. Returns (keys uint64 [P*3k], pos_idx int32 [P*3k] original
    window index). The original base's variant is excluded.
    """
    P = len(lo)
    outs = []
    idxs = []
    base_idx = np.arange(P, dtype=np.int32)
    for p in range(k):
        s = np.uint64(2 * (k - 1 - p))
        orig = (lo >> s) & np.uint64(3)
        cleared = lo & ~(np.uint64(3) << s)
        for b in range(4):
            key = cleared | (np.uint64(b) << s)
            keep = orig != np.uint64(b)
            outs.append(key[keep])
            idxs.append(base_idx[keep])
    return np.concatenate(outs), np.concatenate(idxs)


def _variant_keys_sub2(hi: np.ndarray, lo: np.ndarray, k: int):
    """1-substitution variants of two-word k-mers (32 < k <= 64).

    hi packs bases 0..k-33, lo packs bases k-32..k-1 (ops/kmers.py layout).
    Returns (hi_keys, lo_keys, pos_idx)."""
    P = len(lo)
    out_hi, out_lo, idxs = [], [], []
    base_idx = np.arange(P, dtype=np.int32)
    for p in range(k):
        in_hi = p < k - 32
        s = np.uint64(2 * (k - 33 - p)) if in_hi else np.uint64(2 * (k - 1 - p))
        w = hi if in_hi else lo
        orig = (w >> s) & np.uint64(3)
        cleared = w & ~(np.uint64(3) << s)
        for b in range(4):
            key = cleared | (np.uint64(b) << s)
            keep = orig != np.uint64(b)
            out_hi.append((key if in_hi else hi)[keep])
            out_lo.append((lo if in_hi else key)[keep])
            idxs.append(base_idx[keep])
    return (np.concatenate(out_hi), np.concatenate(out_lo),
            np.concatenate(idxs))


def _variant_keys_del(w: np.ndarray, k: int):
    """k-mers formed by dropping one base of packed (k+1)-windows (the read
    carries one EXTRA base). w: uint64 [P] (k+1 bases, needs 2(k+1) <= 64).
    Returns (keys, pos_idx). Dropping base 0 or k equals a shifted exact
    window, so only interior positions 1..k-1 are emitted."""
    P = len(w)
    outs = []
    idxs = []
    base_idx = np.arange(P, dtype=np.int32)
    for p in range(1, k):
        hi = w >> np.uint64(2 * (k + 1 - p))
        lo_mask = np.uint64((1 << (2 * (k - p))) - 1)
        lo = w & lo_mask
        outs.append((hi << np.uint64(2 * (k - p))) | lo)
        idxs.append(base_idx)
    return np.concatenate(outs), np.concatenate(idxs)


def _variant_keys_ins(w: np.ndarray, k: int):
    """k-mers formed by inserting one base into packed (k-1)-windows (the read
    LOST one base). w: uint64 [P] of k-1 bases. Returns (keys, pos_idx);
    interior insert positions 1..k-1 only (edges equal shifted windows)."""
    P = len(w)
    outs = []
    idxs = []
    base_idx = np.arange(P, dtype=np.int32)
    for p in range(1, k):
        hi = w >> np.uint64(2 * (k - 1 - p))
        lo_mask = np.uint64((1 << (2 * (k - 1 - p))) - 1)
        lo = w & lo_mask
        stem = (hi << np.uint64(2 * (k - p))) | lo
        for b in range(4):
            outs.append(stem | (np.uint64(b) << np.uint64(2 * (k - 1 - p))))
            idxs.append(base_idx)
    return np.concatenate(outs), np.concatenate(idxs)


def find_weak_seeds(cdbg: Cdbg, codes: np.ndarray, a: int, b: int,
                    *, subs: bool = True, indels: bool = True,
                    max_hits_per_pos: int = 1) -> List[SolidRun]:
    """Inexact (1-edit) seeds inside read span [a, b).

    TPU-native re-expression of the reference's masked inexact re-search
    (getSeeds, Graph.cpp:100-196 builds l_s and calls
    searchSequence(l_s, false, true, true, true, true)): instead of an
    approximate-membership automaton, every 1-edit variant key of every window
    is generated with vectorized bit surgery and probed against the sorted
    canonical index in one searchsorted pass. Positions hit by more than
    `max_hits_per_pos` distinct unitig placements are dropped (the conflict
    suppression role of keep_non_overlap, Alignment.cpp:1017-1199).

    Returns single-k-mer SolidRuns with weak=True, rspan in {k-1, k, k+1}.
    One-word k (<=32) probes substitutions + 1-bp indels; two-word k (pass 2,
    k<=64) probes substitutions.
    """
    import ratatosk_tpu.ops.kmers as K
    k = cdbg.k
    if b - a < k:
        return []
    span = codes[a:b].astype(np.uint8)
    two_word = k > 32
    key_groups = []   # (hi_or_None, lo, read_pos, rspan)
    if two_word:
        if subs and len(span) >= k:
            ka, valid = KeyArray.from_codes(span, k)
            hi_k, lo_k, idx = _variant_keys_sub2(ka.hi[valid], ka.lo[valid], k)
            pos_map = np.flatnonzero(valid).astype(np.int32)
            key_groups.append((hi_k, lo_k, pos_map[idx], k))
    else:
        if subs and len(span) >= k:
            ka, valid = KeyArray.from_codes(span, k)
            keys, idx = _variant_keys_sub(ka.lo[valid], k)
            pos_map = np.flatnonzero(valid).astype(np.int32)
            key_groups.append((None, keys, pos_map[idx], k))
        if indels and len(span) >= k + 1 and 2 * (k + 1) <= 64:
            kp1, valid = KeyArray.from_codes(span, k + 1)
            keys, idx = _variant_keys_del(kp1.lo[valid], k)
            pos_map = np.flatnonzero(valid).astype(np.int32)
            key_groups.append((None, keys, pos_map[idx], k + 1))
        if indels and len(span) >= k - 1:
            km1, valid = KeyArray.from_codes(span, k - 1)
            keys, idx = _variant_keys_ins(km1.lo[valid], k)
            pos_map = np.flatnonzero(valid).astype(np.int32)
            key_groups.append((None, keys, pos_map[idx], k - 1))
    if not key_groups:
        return []

    index_keys = KeyArray(k, np.asarray(cdbg.index.keys_lo),
                          np.asarray(cdbg.index.keys_hi) if two_word else None)
    uid_arr = np.asarray(cdbg.index.unitig_id)
    pos_arr = np.asarray(cdbg.index.pos)
    strand_arr = np.asarray(cdbg.index.strand)
    nk = cdbg.nkmers

    found: dict = {}   # read_pos -> set of (uid, direction, o, rspan)
    for hi_k, lo_k, rpos, rspan in key_groups:
        if two_word:
            chi, clo, is_fw = K.canonical_kmer2(hi_k, lo_k, k, np)
            rows = index_keys.find(KeyArray(k, clo, chi))
        else:
            clo, is_fw = K.canonical_kmer(lo_k, k, np)
            rows = index_keys.find(KeyArray(k, clo, None))
        hit = rows >= 0
        if not hit.any():
            continue
        r = rows[hit]
        uid = uid_arr[r]
        direction = np.where(is_fw[hit] == strand_arr[r], 0, 1)
        o = np.where(direction == 0, pos_arr[r], nk[uid] - 1 - pos_arr[r])
        for rp, u, d, oo in zip(rpos[hit], uid, direction, o):
            found.setdefault(int(rp), set()).add((int(u), int(d), int(oo), rspan))

    seeds = []
    for rp in sorted(found):
        hits = found[rp]
        if len(hits) > max_hits_per_pos:
            continue   # ambiguous placement: conflicting variants, drop
        u, d, oo, rspan = next(iter(hits))
        seeds.append(SolidRun(s=a + rp, e=a + rp, uid=u, direction=d, o_s=oo,
                              weak=True, rspan=rspan))
    return seeds


def select_waypoints(seeds: List[SolidRun], colors: GraphColors,
                     flank_rows: np.ndarray, *, min_cov: int = 2,
                     min_space: int = 64, lo: int = 0, hi: int = 1 << 30
                     ) -> List[SolidRun]:
    """Greedy left-to-right waypoint chain: color-consistent with the flanking
    anchors (>= min_cov shared reads) and spaced >= min_space apart and from
    the span edges (so every leg gives the beam real work + certification)."""
    if not seeds:
        return []
    uids = np.array([s.uid for s in seeds])
    shared = CS.intersect_count(colors.rows[uids],
                                np.broadcast_to(flank_rows, (len(uids),) +
                                                flank_rows.shape), np)
    out = []
    last = lo
    for s, sh in zip(seeds, shared):
        if int(sh) < min_cov:
            continue
        if s.s - last < min_space or hi - s.s < min_space:
            continue
        out.append(s)
        last = s.s
    return out


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
