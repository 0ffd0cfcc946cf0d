"""Device beam search over the unitig graph with carried DP rows.

TPU-native re-expression of the reference's weak-region path enumeration
(explorePathsBFS/explorePathsBFS2 + exploreSubGraph, GraphTraversal.cpp:3-720)
and per-step SHW re-anchoring (GraphTraversal.cpp:57-62): instead of a queue
of variable-length paths each re-aligned from scratch, a fixed-width beam
advances ONE BASE per step; every beam entry carries the last row of its
edit-distance DP against the raw region, so each step costs one
`extend_rows` over the whole batch (ARCHITECTURE.md §6).

Per step, an entry mid-unitig emits its unitig's next base deterministically;
an entry at a unitig boundary branches into <=4 successors filtered by
  - edge existence (graph topology),
  - edge read-support (UnitigData.shared_pids analog, Graph.cpp:2003),
  - |colors(successor) ∩ region colors| >= min_cov (GraphTraversal.cpp:485-489).
All candidates are scored (alignment prefix score + color score, mirroring
getScorePath's (align+color)/2, GraphTraversal.cpp:860) and the top `beam`
survive. Entries reaching the right anchor k-mer freeze with their final NW
distance; dead ends freeze with their prefix distance so open regions keep
their best partial path.

Everything is static-shape: regions are bucketed by padded target length NT,
path budget LMAX ~= 1.25*NT (the reference's +-25% length window,
getMinMaxLength, Common.hpp:435-438).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ratatosk_tpu.correct.graphdev import DeviceGraph
from ratatosk_tpu.ops import align as A
from ratatosk_tpu.ops import colorset as CS

NEG = jnp.float32(-1e9)
_CAPC = 16  # color-count saturation for the color score


class RegionBatch(NamedTuple):
    """[R]-leading device arrays describing weak regions (one bucket)."""

    tgt_masks: jnp.ndarray   # uint8 [R, NT] 4-bit IUPAC masks of the raw region
    tgt_len: jnp.ndarray     # int32 [R]
    start_tip: jnp.ndarray   # int32 [R] packed (uid<<1|dir) of the left anchor
    start_off: jnp.ndarray   # int32 [R] next oriented base to emit
    end_tip: jnp.ndarray     # int32 [R] right anchor tip, -1 = open region
    end_off: jnp.ndarray     # int32 [R] `off` value that completes the region
    colors: jnp.ndarray      # int32 [R, CC] sorted padded region color set
    max_plen: jnp.ndarray    # int32 [R] path length budget (+-25% window,
                             # getMinMaxLength, Common.hpp:435-438)


class BeamState(NamedTuple):
    tip: jnp.ndarray     # int32 [R, B]
    off: jnp.ndarray     # int32 [R, B]
    plen: jnp.ndarray    # int32 [R, B]
    seq: jnp.ndarray     # uint8 [R, B, L]
    row: jnp.ndarray     # int32 [R, B, NT+1]
    live: jnp.ndarray    # bool [R, B] slot holds a real path
    frozen: jnp.ndarray  # bool [R, B] stopped (completed or dead end)
    compl_: jnp.ndarray  # bool [R, B] reached the right anchor
    ccsum: jnp.ndarray   # float32 [R, B] accumulated color score
    nvis: jnp.ndarray    # int32 [R, B] unitigs entered


class BeamResult(NamedTuple):
    best_seq: jnp.ndarray     # uint8 [R, L] 2-bit codes of the winning path
    best_len: jnp.ndarray     # int32 [R]
    best_dist: jnp.ndarray    # int32 [R] NW distance (closed) / prefix distance
    best_end: jnp.ndarray     # int32 [R] target prefix consumed (open regions)
    second_dist: jnp.ndarray  # int32 [R] runner-up distance (quality margin)
    completed: jnp.ndarray    # bool [R] a path reached the right anchor
    n_done: jnp.ndarray       # int32 [R]


def _entry_scores(row, plen, compl_, tgt_len, ccsum, nvis):
    """Score [R,B]: completed -> NW score, else prefix score; +color mean."""
    dist_pref, _, _ = A.best_prefix_from_row(
        row.reshape(-1, row.shape[-1]), tgt_len.reshape(-1))
    dist_pref = dist_pref.reshape(row.shape[:-1])
    dist_nw = jnp.take_along_axis(row, tgt_len[..., None].astype(jnp.int32), axis=-1)[..., 0]
    align = jnp.where(
        compl_,
        1.0 - dist_nw.astype(jnp.float32) / jnp.maximum(tgt_len, 1).astype(jnp.float32),
        1.0 - dist_pref.astype(jnp.float32) / jnp.maximum(plen, 1).astype(jnp.float32),
    )
    color = ccsum / jnp.maximum(nvis, 1).astype(jnp.float32)
    return 0.5 * jnp.clip(align, -1.0, 1.0) + 0.5 * color, dist_pref, dist_nw


def _beam_step(g: DeviceGraph, rb: RegionBatch, st: BeamState, min_cov: int):
    R, B = st.tip.shape
    L = st.seq.shape[-1]
    k = g.k
    n1 = st.row.shape[-1]

    uid = jnp.maximum(st.tip >> 1, 0)
    d = st.tip & 1
    ul = g.ulen[uid]
    active = st.live & ~st.frozen
    at_bound = active & (st.off >= ul)
    mid = active & (st.off < ul)

    # mid-unitig next base (oriented)
    pos = jnp.where(d == 0, st.off, ul - 1 - st.off)
    pos = jnp.clip(pos, 0, jnp.maximum(ul - 1, 0))
    nb = g.useq[g.uoff[uid] + pos.astype(g.uoff.dtype)].astype(jnp.int32)
    nb = jnp.where(d == 0, nb, 3 - nb)

    # branch candidates: successors of (uid, leaving strand = direction)
    e = g.edges[uid, d]                    # [R, B, 4]
    esup = g.edge_support[uid, d]          # [R, B, 4]
    cand_uid = jnp.maximum(e >> 1, 0)
    ccols = g.color_rows[cand_uid]         # [R, B, 4, cap]
    shared = CS.intersect_count_dense(ccols, rb.colors[:, None, None, :], jnp)
    branch_ok = (e >= 0) & esup & (shared >= min_cov) & at_bound[..., None]

    cidx = jnp.arange(4, dtype=jnp.int32)[None, None, :]
    # slot c: boundary -> successor with base c; mid -> only slot nb advances
    valid = jnp.where(at_bound[..., None], branch_ok, mid[..., None] & (cidx == nb[..., None]))
    cand_tip = jnp.where(at_bound[..., None], e, st.tip[..., None])
    cand_off = jnp.where(at_bound[..., None], jnp.int32(k), st.off[..., None] + 1)
    # frozen entries persist through slot 0; an active boundary entry with no
    # viable successor freezes too (dead end — kept so open regions retain
    # their best partial path)
    no_succ = at_bound & ~branch_ok.any(axis=-1)
    keep = ((st.live & ~active) | no_succ)[..., None] & (cidx == 0)
    valid = valid | keep
    emits = valid & ~keep

    cand_tip = jnp.where(keep, st.tip[..., None], cand_tip)
    cand_off = jnp.where(keep, st.off[..., None], cand_off)
    cand_plen = jnp.where(emits, st.plen[..., None] + 1, st.plen[..., None])
    cand_ccsum = jnp.where(
        at_bound[..., None] & emits,
        st.ccsum[..., None] + jnp.minimum(shared, _CAPC).astype(jnp.float32) / _CAPC,
        st.ccsum[..., None])
    cand_nvis = jnp.where(at_bound[..., None] & emits,
                          st.nvis[..., None] + 1, st.nvis[..., None])
    cand_compl = st.compl_[..., None] | (
        emits & (rb.end_tip[:, None, None] >= 0)
        & (cand_tip == rb.end_tip[:, None, None])
        & (cand_off == rb.end_off[:, None, None]))

    # DP row extension for emitting candidates (4-bit mask of base c)
    base_mask = (jnp.int32(1) << cidx).astype(jnp.int32)       # [1,1,4]
    flat_row = jnp.broadcast_to(st.row[:, :, None, :], (R, B, 4, n1)).reshape(-1, n1)
    flat_mask = jnp.broadcast_to(base_mask, (R, B, 4)).reshape(-1)
    flat_tgt = jnp.broadcast_to(rb.tgt_masks[:, None, None, :],
                                (R, B, 4, n1 - 1)).reshape(-1, n1 - 1)
    flat_plen = cand_plen.reshape(-1)
    new_row = A.extend_rows(flat_row, flat_mask, flat_tgt, flat_plen).reshape(R, B, 4, n1)
    cand_row = jnp.where(emits[..., None], new_row, st.row[:, :, None, :])

    # newly-frozen: completed, dead end, or path length budget exhausted
    over = cand_plen >= rb.max_plen[:, None, None]
    cand_frozen = (st.frozen[..., None] | cand_compl | over
                   | (no_succ[..., None] & keep))

    tl = jnp.broadcast_to(rb.tgt_len[:, None, None], (R, B, 4))
    score, _, _ = _entry_scores(cand_row, cand_plen, cand_compl, tl,
                                cand_ccsum, cand_nvis)
    score = jnp.where(valid, score, NEG)

    # --- top-`beam` selection as one-hot matmuls (MXU) ---
    # take_along_axis over a middle axis and element scatters serialize on
    # TPU (~1ms each); a [R,B,C] one-hot times a [R,C,F] feature tensor is a
    # small batched matmul instead. One-hot rows are exactly 1.0 and every
    # carried value is < 2^24, so the f32 contraction is exact.
    C = B * 4
    fscore = score.reshape(R, C)
    _, sel = jax.lax.top_k(fscore, B)                      # [R, B]
    P = jax.nn.one_hot(sel, C, dtype=jnp.float32)          # [R, B, C]

    scalars = jnp.stack([
        cand_tip.astype(jnp.float32),
        cand_off.astype(jnp.float32),
        cand_plen.astype(jnp.float32),
        cand_frozen.astype(jnp.float32),
        cand_compl.astype(jnp.float32),
        cand_ccsum,
        cand_nvis.astype(jnp.float32),
        emits.astype(jnp.float32),
        (cand_tip & 3).astype(jnp.float32) * 0,  # pad to 9 for alignment
    ], axis=-1).reshape(R, C, 9)
    feat = jnp.concatenate([scalars, cand_row.astype(jnp.float32).reshape(R, C, n1)],
                           axis=-1)                        # [R, C, 9+n1]
    selected = jnp.einsum("rbc,rcf->rbf", P, feat,
                          preferred_element_type=jnp.float32)
    new_tip = selected[..., 0].astype(jnp.int32)
    new_off = selected[..., 1].astype(jnp.int32)
    new_plen = selected[..., 2].astype(jnp.int32)
    new_frozen = selected[..., 3] > 0.5
    new_compl = selected[..., 4] > 0.5
    new_ccsum = selected[..., 5]
    new_nvis = selected[..., 6].astype(jnp.int32)
    sel_emit = selected[..., 7] > 0.5
    new_row = selected[..., 9:].astype(jnp.int32)
    new_live = jnp.take_along_axis(fscore, sel, axis=1) > NEG / 2

    # sequences: parent one-hot matmul, then write the emitted base (the
    # candidate's slot index sel&3) at column plen-1 via an iota mask
    Pp = jax.nn.one_hot(sel >> 2, B, dtype=jnp.float32)    # [R, B, B]
    seq_par = jnp.einsum("rbp,rpl->rbl", Pp, st.seq.astype(jnp.float32),
                         preferred_element_type=jnp.float32)
    sel_c = (sel & 3).astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (R, B, L), 2)
    wmask = sel_emit[..., None] & (col == (new_plen - 1)[..., None])
    seq_new = jnp.where(wmask, sel_c[..., None], seq_par).astype(jnp.uint8)

    return BeamState(
        tip=new_tip, off=new_off, plen=new_plen,
        seq=seq_new, row=new_row,
        live=new_live, frozen=new_frozen, compl_=new_compl,
        ccsum=new_ccsum, nvis=new_nvis,
    )


@functools.partial(jax.jit, static_argnames=("beam", "lmax", "min_cov"))
def beam_search(g: DeviceGraph, rb: RegionBatch, *, beam: int, lmax: int,
                min_cov: int = 2) -> BeamResult:
    R, NT = rb.tgt_masks.shape
    slot0 = jnp.broadcast_to(jnp.arange(beam)[None, :] == 0, (R, beam))
    st = BeamState(
        tip=jnp.where(slot0, rb.start_tip[:, None], -1).astype(jnp.int32),
        off=jnp.broadcast_to(rb.start_off[:, None], (R, beam)).astype(jnp.int32),
        plen=jnp.zeros((R, beam), jnp.int32),
        seq=jnp.zeros((R, beam, lmax), jnp.uint8),
        row=jnp.broadcast_to(A.row_init(1, NT, A.NW)[0][None, None, :],
                             (R, beam, NT + 1)).astype(jnp.int32),
        live=slot0,
        frozen=jnp.zeros((R, beam), bool),
        compl_=jnp.zeros((R, beam), bool),
        ccsum=jnp.zeros((R, beam), jnp.float32),
        nvis=jnp.zeros((R, beam), jnp.int32),
    )

    # while_loop with an all-frozen early exit: most regions complete near
    # their target length, well before the bucket's worst-case lmax
    def cond(carry):
        i, s = carry
        return (i < lmax) & (s.live & ~s.frozen).any()

    def body(carry):
        i, s = carry
        return i + 1, _beam_step(g, rb, s, min_cov)

    _, st = jax.lax.while_loop(cond, body, (jnp.int32(0), st))

    tlb = jnp.broadcast_to(rb.tgt_len[:, None], st.plen.shape)
    score, dist_pref, dist_nw = _entry_scores(st.row, st.plen, st.compl_, tlb,
                                              st.ccsum, st.nvis)
    is_open = rb.end_tip < 0
    # closed regions rank completed paths; if none completed, fall back to the
    # best partial path (the engine merges fw/bw partials, generateConsensus-
    # style, Alignment.cpp:309-470). Open regions rank every path.
    has_compl = (st.live & st.compl_).any(axis=1)
    eligible = jnp.where(is_open[:, None] | ~has_compl[:, None],
                         st.live, st.live & st.compl_)
    escore = jnp.where(eligible, score, NEG)
    order = jnp.argsort(-escore, axis=1)
    b0 = order[:, 0]
    b1 = order[:, jnp.minimum(1, escore.shape[1] - 1)]
    ar = jnp.arange(R)
    any_ok = eligible[ar, b0]
    dist = jnp.where(is_open[:, None], dist_pref, dist_nw)
    _, end_max, _ = A.best_prefix_from_row(st.row[ar, b0], rb.tgt_len)
    second = jnp.where(eligible[ar, b1] & (b1 != b0), dist[ar, b1], jnp.int32(1 << 20))
    return BeamResult(
        best_seq=st.seq[ar, b0],
        best_len=jnp.where(any_ok, st.plen[ar, b0], 0),
        best_dist=jnp.where(any_ok, dist[ar, b0], jnp.int32(1 << 20)),
        best_end=jnp.where(any_ok, end_max, 0),
        second_dist=second,
        completed=st.compl_[ar, b0] & any_ok,
        n_done=(st.live & st.compl_).sum(axis=1).astype(jnp.int32),
    )
