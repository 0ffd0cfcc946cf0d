"""Read simulation for tests and benchmarks.

The reference has no test suite (SURVEY.md §4); its de-facto test is
end-to-end error-rate reduction on real data. We simulate: a random genome,
error-free (or low-error) short reads, and ONT-like noisy long reads with
mixed substitutions/insertions/deletions.
"""

from __future__ import annotations

import numpy as np

from ratatosk_tpu import dna


def random_genome(rng: np.random.Generator, length: int, repeat_frac: float = 0.0,
                  repeat_len: int = 200) -> np.ndarray:
    """Random base-code genome; optionally paste repeated segments."""
    g = rng.integers(0, 4, size=length).astype(np.uint8)
    n_rep = int(length * repeat_frac / max(repeat_len, 1))
    for _ in range(n_rep):
        src = rng.integers(0, length - repeat_len)
        dst = rng.integers(0, length - repeat_len)
        g[dst:dst + repeat_len] = g[src:src + repeat_len]
    return g


def short_reads(rng: np.random.Generator, genome: np.ndarray, coverage: float,
                read_len: int = 150, err: float = 0.0, paired_insert: int = 0):
    """Uniformly sampled short reads (list of code arrays), random strand."""
    n = int(len(genome) * coverage / read_len)
    reads = []
    for _ in range(n):
        start = rng.integers(0, len(genome) - read_len + 1)
        r = genome[start:start + read_len].copy()
        if err > 0:
            mask = rng.random(read_len) < err
            r[mask] = (r[mask] + rng.integers(1, 4, size=int(mask.sum()))) % 4
        if rng.random() < 0.5:
            r = dna.revcomp_codes(r)
        reads.append(r.astype(np.uint8))
    return reads


def noisy_long_read(rng: np.random.Generator, genome: np.ndarray, start: int,
                    length: int, err: float = 0.10,
                    mix=(0.5, 0.25, 0.25)) -> tuple[np.ndarray, np.ndarray]:
    """One ONT-like read: (noisy codes, true codes). mix = (sub, ins, del)."""
    true = genome[start:start + length]
    out = []
    i = 0
    p_sub, p_ins, p_del = mix
    while i < len(true):
        r = rng.random()
        if r < err * p_sub:
            out.append((true[i] + rng.integers(1, 4)) % 4)
            i += 1
        elif r < err * (p_sub + p_ins):
            out.append(rng.integers(0, 4))
            # no i advance: insertion
        elif r < err:
            i += 1  # deletion
        else:
            out.append(true[i])
            i += 1
    return np.array(out, dtype=np.uint8), true.astype(np.uint8)


def long_reads(rng: np.random.Generator, genome: np.ndarray, n: int,
               min_len: int = 2000, max_len: int = 8000, err: float = 0.10):
    """n noisy long reads; returns list of (noisy, true, start)."""
    out = []
    for _ in range(n):
        length = int(rng.integers(min_len, min(max_len, len(genome)) + 1))
        start = int(rng.integers(0, len(genome) - length + 1))
        noisy, true = noisy_long_read(rng, genome, start, length, err)
        out.append((noisy, true, start))
    return out


def error_rate(a: np.ndarray, b: np.ndarray) -> float:
    """Edit distance / len(b) via numpy row DP (oracle; also used in tests)."""
    if len(a) == 0:
        return 1.0 if len(b) else 0.0
    n = len(b)
    j_idx = np.arange(n + 1, dtype=np.int64)
    prev = j_idx.copy()
    for i in range(len(a)):
        # D[j] = min(E[i-1][j-1]+sub_j, E[i-1][j]+1), D[0] = row boundary i+1;
        # E[i][j] = j + cummin(D[l] - l)  (the prefix-min scan trick,
        # same recurrence as ratatosk_tpu.ops.align)
        d = np.concatenate((
            [i + 1],
            np.minimum(prev[:-1] + (b != a[i]), prev[1:] + 1),
        ))
        prev = j_idx + np.minimum.accumulate(d - j_idx)
    return float(prev[-1]) / max(n, 1)
