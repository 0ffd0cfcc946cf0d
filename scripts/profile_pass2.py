"""Profile pass-2 correction (k=63, two-word index) at reduced scale."""
from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import tempfile
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
    from ratatosk_tpu.io import fastx
    from ratatosk_tpu.pipeline import build_pass2_index, correct_file, _pass_opt

    rng = np.random.default_rng(1234)
    print(f"[prof2] genome {glen}, {n_reads} reads", file=sys.stderr)
    genome = testing.random_genome(rng, glen, repeat_frac=0.15, repeat_len=250)
    sreads = testing.short_reads(rng, genome, coverage=40.0)
    opt = CorrectOpt(small_k=31, k=63, beam_width=16, batch_regions=512,
                     nb_threads=1, read_batch_bp=1 << 20)
    o1 = _pass_opt(opt, 1)
    cdbg = B.build_cdbg(sreads, 31, min_count=2)
    colors = color_graph(cdbg, sreads)
    corr1 = Corrector(cdbg, colors, o1)
    corr1.warmup_compile()

    tmpdir = tempfile.mkdtemp(prefix="rtpu_prof_")
    lr_path = os.path.join(tmpdir, "long.fq")
    with open(lr_path, "w") as f:
        for i in range(n_reads):
            start = int(rng.integers(0, glen - read_len))
            noisy, _ = testing.noisy_read(rng, genome, start, read_len,
                                          err=0.10)
            f.write(f"@L{i}\n{dna.decode(noisy)}\n+\n{'!' * len(noisy)}\n")
    p1_path = os.path.join(tmpdir, "out.2.fastq")
    correct_file(corr1, o1, [lr_path], p1_path, 1)
    print("[prof2] pass-1 done; building pass-2 index", file=sys.stderr)

    cdbg2, colors2 = build_pass2_index(
        opt, ((r.codes, r.qual) for r in fastx.read_fastx(p1_path)),
        sreads, list(range(len(sreads))))
    o2 = _pass_opt(opt, 2)
    corr2 = Corrector(cdbg2, colors2, o2)
    corr2.warmup_compile()

    reads, quals = [], []
    for r in fastx.read_fastx(p1_path):
        reads.append(r.codes)
        quals.append(r.qual)
    corr2.correct_batch(reads[:32], quals[:32])
    corr2.timers = {k: 0.0 for k in corr2.timers}

    pr = cProfile.Profile()
    t0 = time.time()
    pr.enable()
    corr2.correct_batch(reads, quals)
    pr.disable()
    wall = time.time() - t0
    nb = sum(len(r) for r in reads)
    print(f"[prof2] {nb} bases in {wall:.2f}s = {nb/wall:.0f} b/s; timers: "
          + ", ".join(f"{k}={v:.2f}s" for k, v in corr2.timers.items()),
          file=sys.stderr)
    s = io.StringIO()
    ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
    ps.print_stats(40)
    print(s.getvalue())


if __name__ == "__main__":
    main()
