"""Profile the correction hot path at reduced scale.

Usage: python scripts/profile_correct.py [glen] [n_reads] [pass2]

Separates:
  - plan (host)
  - launch/dispatch (host->device)
  - device wait (block_until_ready right after all launches)
  - host finish (everything after results are ready)
and prints a cProfile top-40 of the host side.
"""
from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    glen = int(sys.argv[1]) if len(sys.argv) > 1 else 800_000
    n_reads = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    read_len = 4000

    from ratatosk_tpu import dna, testing
    from ratatosk_tpu.config import CorrectOpt
    from ratatosk_tpu.correct.engine import Corrector
    from ratatosk_tpu.graph import build as B
    from ratatosk_tpu.graph.colors import color_graph
    from ratatosk_tpu.pipeline import _pass_opt

    rng = np.random.default_rng(1234)
    print(f"[prof] genome {glen}, {n_reads} reads", file=sys.stderr)
    genome = testing.random_genome(rng, glen, repeat_frac=0.15, repeat_len=250)
    sreads = testing.short_reads(rng, genome, coverage=40.0)
    opt = CorrectOpt(small_k=31, k=63, beam_width=16, batch_regions=512,
                     nb_threads=1, read_batch_bp=1 << 20)
    o1 = _pass_opt(opt, 1)
    t0 = time.time()
    cdbg = B.build_cdbg(sreads, 31, min_count=2)
    colors = color_graph(cdbg, sreads)
    print(f"[prof] graph {cdbg.n_unitigs} unitigs ({time.time()-t0:.1f}s)",
          file=sys.stderr)
    corr = Corrector(cdbg, colors, o1)
    corr.warmup_compile()

    reads, quals = [], []
    for i in range(n_reads):
        start = int(rng.integers(0, glen - read_len))
        noisy, _ = testing.noisy_read(rng, genome, start, read_len, err=0.10)
        reads.append(noisy)
        quals.append(np.full(len(noisy), 33, np.uint8))

    # warm slice
    corr.correct_batch(reads[:32], quals[:32])
    corr.timers = {k: 0.0 for k in corr.timers}

    pr = cProfile.Profile()
    t0 = time.time()
    pr.enable()
    out = corr.correct_batch(reads, quals)
    pr.disable()
    wall = time.time() - t0
    nb = sum(len(r) for r in reads)
    print(f"[prof] {nb} bases in {wall:.2f}s = {nb/wall:.0f} b/s; timers: "
          + ", ".join(f"{k}={v:.2f}s" for k, v in corr.timers.items()),
          file=sys.stderr)
    s = io.StringIO()
    ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
    ps.print_stats(45)
    print(s.getvalue())


if __name__ == "__main__":
    main()
