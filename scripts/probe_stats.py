"""Measure device probe/runs kernel stats + timings at bench-like scale."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    glen = int(sys.argv[1]) if len(sys.argv) > 1 else 800_000
    n_reads = int(sys.argv[2]) if len(sys.argv) > 2 else 250
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 31

    import jax
    from ratatosk_tpu import testing
    from ratatosk_tpu.graph import build as B
    from ratatosk_tpu.ops.plan_device import DevicePlanner

    rng = np.random.default_rng(1234)
    genome = testing.random_genome(rng, glen, repeat_frac=0.15, repeat_len=250)
    sreads = testing.short_reads(rng, genome, coverage=40.0)
    cdbg = B.build_cdbg(sreads, k, min_count=2)
    print(f"[stats] graph k={k}: {cdbg.n_unitigs} unitigs, "
          f"{cdbg.index.n} keys", file=sys.stderr)
    dp = DevicePlanner.build(cdbg)
    print(f"[stats] hx dmax={dp.hx.dmax} bits={dp.hx.bits} "
          f"pf_bits={dp.pf_bits} hf_bits={dp.hf_bits}", file=sys.stderr)

    reads = []
    for i in range(n_reads):
        start = int(rng.integers(0, glen - 4000))
        noisy, _ = testing.noisy_read(rng, genome, start, 4000, err=0.10)
        reads.append(noisy)
    spans = [(i, 100, len(r) - 100) for i, r in enumerate(reads)]

    # runs kernel
    h = dp.dispatch_runs(reads)
    jax.block_until_ready(h[0])
    t0 = time.time()
    for _ in range(3):
        h = dp.dispatch_runs(reads)
        jax.block_until_ready(h[0])
    print(f"[stats] runs kernel: {(time.time()-t0)/3*1000:.0f} ms/batch",
          file=sys.stderr)
    rl = dp.collect_runs(h)
    print(f"[stats] runs: {sum(len(r) for r in rl)}", file=sys.stderr)

    # probe kernel
    ph = dp.dispatch_probe(reads, spans, stride=2, near_exact_skip=16)
    jax.block_until_ready(ph[0])
    t0 = time.time()
    for _ in range(3):
        ph = dp.dispatch_probe(reads, spans, stride=2, near_exact_skip=16)
        jax.block_until_ready(ph[0])
    dt = (time.time() - t0) / 3
    out = ph[0]
    stats = np.asarray(out[6])
    L = sum(len(r) for r in reads) + len(reads)
    print(f"[stats] probe kernel: {dt*1000:.0f} ms/batch; concat={L} "
          f"padded={dp.min_tier} qcap={dp._qcap(dp.min_tier)} "
          f"hcap={ph[3]} n_allowed={stats[0]} nq_max={stats[1]} "
          f"survivors={stats[2]} seeds={stats[3]} of={bool(out[5])}",
          file=sys.stderr)
    seeds = dp.collect_probe(ph)
    if seeds is None:
        print("[stats] OVERFLOW -> fallback", file=sys.stderr)


if __name__ == "__main__":
    main()
