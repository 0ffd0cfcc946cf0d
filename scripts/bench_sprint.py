"""A/B the sprint implementations (XLA fused vs Pallas) per launch at the
three production bucket shapes (VERDICT r4 next #2: recorded per-launch A/B).

Usage: python scripts/bench_sprint.py [R] [beam]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    R = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    beam = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    import jax
    from ratatosk_tpu import testing
    from ratatosk_tpu.config import CorrectOpt
    from ratatosk_tpu.correct import beam as BM
    from ratatosk_tpu.correct.engine import make_region_batch, RegionSpec, BUCKETS

    _, corr = testing.build_toy_corrector(seed=9, glen=20000, k=31)
    g = corr.g
    rng = np.random.default_rng(3)

    for nt in BUCKETS:
        band = 0 if nt <= 256 else max(192, nt // 16)
        specs = []
        for i in range(R):
            ln = min(nt, int(rng.integers(nt // 2, nt + 1)))
            specs.append(RegionSpec(
                read_idx=0, kind="gap", raw_a=0, raw_b=ln,
                tgt=rng.integers(0, 4, ln).astype(np.uint8),
                start_tip=0, start_off=corr.cdbg.k, end_tip=2, end_off=31,
                colors_row=corr.colors.rows[0].copy()))
        rb, lmax = make_region_batch(specs, nt, corr.colors.cap)
        W = nt + 1 if band <= 0 or band >= nt + 1 else band
        for impl in ("xla", "pallas"):
            t0 = time.time()
            res = BM.beam_search(g, rb, beam=beam, lmax=lmax, min_cov=2,
                                 band=band, sprint=8, sprint_impl=impl)
            jax.block_until_ready(res)
            compile_s = time.time() - t0
            times = []
            for _ in range(3):
                t0 = time.time()
                res = BM.beam_search(g, rb, beam=beam, lmax=lmax, min_cov=2,
                                     band=band, sprint=8, sprint_impl=impl)
                jax.block_until_ready(res)
                times.append(time.time() - t0)
            print(f"NT={nt} W={W} R={R} B={beam} {impl:7s}: "
                  f"{min(times)*1000:8.1f} ms/launch (compile {compile_s:.1f}s)",
                  flush=True)


if __name__ == "__main__":
    main()
