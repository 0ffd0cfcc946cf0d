"""Benchmark: corrected long-read bases/sec on one chip (pass-1 style).

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no throughput numbers (BASELINE.md: published is
empty); vs_baseline is reported against a fixed reference point of
100k corrected bases/sec/chip (a 32-core node correcting ~40 Mbp/day/core-hour
scale — the Nextflow profile's 50x32-core x 24h budget for a human genome,
BASELINE.md cluster sizing), so >1.0 means faster than the reference's
per-node budget.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_BASES_PER_SEC = 100_000.0


def log(msg: str) -> None:
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def main() -> None:
    t_all = time.time()
    from ratatosk_tpu import testing
    from ratatosk_tpu.config import CorrectOpt

    rng = np.random.default_rng(1234)
    glen = int(float(sys.argv[1])) if len(sys.argv) > 1 else 100_000
    n_reads = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    read_len = 4000

    log(f"simulating genome={glen}bp, {n_reads} long reads x {read_len}bp")
    genome = testing.random_genome(rng, glen, repeat_frac=0.1, repeat_len=300)
    sreads = testing.short_reads(rng, genome, coverage=40.0)

    log("building colored cDBG (host)")
    t0 = time.time()
    from ratatosk_tpu.graph import build as B
    from ratatosk_tpu.graph.colors import color_graph
    from ratatosk_tpu.correct.engine import Corrector
    cdbg = B.build_cdbg(sreads, 31, min_count=2)
    colors = color_graph(cdbg, sreads)
    log(f"graph: {cdbg.n_unitigs} unitigs, {cdbg.index.n} k-mers "
        f"({time.time() - t0:.1f}s)")

    opt = CorrectOpt(small_k=31, k=63, beam_width=16, batch_regions=64)
    corr = Corrector(cdbg, colors, opt)

    reads = []
    for _ in range(n_reads):
        start = int(rng.integers(0, glen - read_len))
        noisy, _ = testing.noisy_read(rng, genome, start, read_len, err=0.10)
        reads.append(noisy)
    total_bases = sum(len(r) for r in reads)

    # warm up on the full workload so every bucket shape is compiled (and
    # lands in the persistent cache) before the timed pass
    log("warmup (compiles bucket kernels)")
    t0 = time.time()
    corr.correct_batch(reads)
    log(f"warmup done ({time.time() - t0:.1f}s)")

    corr.timers = {k: 0.0 for k in corr.timers}
    t0 = time.time()
    results = corr.correct_batch(reads)
    dt = time.time() - t0
    log(f"breakdown: {', '.join(f'{k}={v:.2f}s' for k, v in corr.timers.items())}")
    out_bases = sum(len(r.codes) for r in results)
    bps = total_bases / dt
    log(f"corrected {total_bases} bases in {dt:.2f}s -> {bps:.0f} bases/s "
        f"(output {out_bases} bases); total wall {time.time() - t_all:.1f}s")

    print(json.dumps({
        "metric": "corrected_long_read_bases_per_sec_per_chip",
        "value": round(bps, 1),
        "unit": "bases/s",
        "vs_baseline": round(bps / BASELINE_BASES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
