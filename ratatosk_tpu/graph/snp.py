"""SNP-candidate detection: annotate unitig positions with IUPAC ambiguity.

The reference's detectSNPs (Graph.cpp:484-720) probes every unitig k-mer for
1-substitution matches on other unitigs, then validates candidates by
color-compatible neighborhoods (isValidSNPcandidate,
GraphTraversal.cpp:1057-1147), storing (pos<<4|iupac) annotations per unitig
(UnitigData.hpp:448-451).

TPU-native reformulation: heterozygous SNPs are *simple bubbles* in the cDBG —
two parallel unitigs that share their predecessor and successor and differ at
isolated positions. Bubble pairing is a sort/group pass over the edge table
(no per-k-mer probing), and the color-compatibility check is one set
intersection per bubble pair.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from ratatosk_tpu import dna
from ratatosk_tpu.graph.build import Cdbg
from ratatosk_tpu.graph.colors import GraphColors
from ratatosk_tpu.ops import colorset as CS


@dataclasses.dataclass
class SnpAnnotations:
    """CSR of per-unitig ambiguous sites: position + 4-bit IUPAC mask."""

    offsets: np.ndarray   # int64 [N+1]
    pos: np.ndarray       # int32 [M] position on the (forward) unitig
    mask: np.ndarray      # uint8 [M] IUPAC mask (union of both alleles)

    def sites_for(self, uid: int):
        a, b = self.offsets[uid], self.offsets[uid + 1]
        return self.pos[a:b], self.mask[a:b]

    @property
    def n_sites(self) -> int:
        return int(self.pos.shape[0])


def _endpoints(cdbg: Cdbg) -> np.ndarray:
    """For each unitig: packed (pred, succ) endpoints if it has exactly one
    predecessor and one successor; else -1. Orientation-normalized so a
    bubble's two branches key identically."""
    n = cdbg.n_unitigs
    ends = np.full((n, 2), -1, dtype=np.int64)
    for s, col in ((0, 1), (1, 0)):
        e = cdbg.edges[:, s, :]              # successors leaving strand s
        cnt = (e >= 0).sum(axis=1)
        one = cnt == 1
        tgt = e[np.arange(n), np.argmax(e >= 0, axis=1)]
        ends[one, col] = tgt[one]
    # ends[:,0] = the unique predecessor-side neighbor (as seen leaving
    # strand 1), ends[:,1] = the unique successor-side neighbor
    return ends


def detect_snps(cdbg: Cdbg, colors: Optional[GraphColors] = None,
                max_mismatches: int = 4,
                min_cov: int = 2) -> SnpAnnotations:
    """Pair equal-length parallel unitigs (simple bubbles); annotate
    mismatching positions as IUPAC on both branches."""
    n = cdbg.n_unitigs
    ulen = cdbg.ulen
    ends = _endpoints(cdbg)
    ok = (ends >= 0).all(axis=1)
    sites: list = [[] for _ in range(n)]

    # group unitigs by unordered endpoint pair + length
    cand = np.flatnonzero(ok)
    if cand.size:
        lo = np.minimum(ends[cand, 0], ends[cand, 1])
        hi = np.maximum(ends[cand, 0], ends[cand, 1])
        key = (lo.astype(np.int64) << 32) | hi.astype(np.int64)
        order = np.lexsort((ulen[cand], key))
        cand = cand[order]
        key = key[order]
        lens = ulen[cand]
        start = 0
        for i in range(1, cand.size + 1):
            if i == cand.size or key[i] != key[start] or lens[i] != lens[start]:
                group = cand[start:i]
                if group.size >= 2:
                    _annotate_group(cdbg, colors, group, sites,
                                    max_mismatches, min_cov)
                start = i

    offsets = np.zeros(n + 1, dtype=np.int64)
    for u in range(n):
        offsets[u + 1] = offsets[u] + len(sites[u])
    pos = np.empty(offsets[-1], dtype=np.int32)
    mask = np.empty(offsets[-1], dtype=np.uint8)
    for u in range(n):
        for j, (p, m) in enumerate(sorted(sites[u])):
            pos[offsets[u] + j] = p
            mask[offsets[u] + j] = m
    return SnpAnnotations(offsets=offsets, pos=pos, mask=mask)


def _annotate_group(cdbg: Cdbg, colors, group, sites, max_mismatches, min_cov):
    seqs = [cdbg.unitig_codes(u) for u in group]
    for i in range(len(group)):
        for j in range(i + 1, len(group)):
            a, b = seqs[i], seqs[j]
            if colors is not None and (colors.card[group[i]] < min_cov
                                       or colors.card[group[j]] < min_cov):
                continue  # both alleles need read support
            # branches may sit on opposite strands between the same endpoints
            for rc in (False, True):
                bx = dna.revcomp_codes(b) if rc else b
                diff = np.flatnonzero(a != bx)
                if not (0 < diff.size <= max_mismatches):
                    continue
                for p in diff:
                    m = int(dna.codes_to_masks(a[p:p + 1])[0]
                            | dna.codes_to_masks(bx[p:p + 1])[0])
                    sites[group[i]].append((int(p), m))
                    # map the site into j's forward frame
                    q = (len(b) - 1 - int(p)) if rc else int(p)
                    mq = dna.revcomp_mask(m) if rc else m
                    sites[group[j]].append((q, mq))
                break
