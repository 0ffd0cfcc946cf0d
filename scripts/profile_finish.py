"""Profile the per-region finish path at bench-like scale (pass 1 only)."""
import cProfile
import pstats
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

from ratatosk_tpu import testing
from ratatosk_tpu.config import CorrectOpt
from ratatosk_tpu.correct.engine import Corrector
from ratatosk_tpu.graph import build as B
from ratatosk_tpu.graph.colors import color_graph
from ratatosk_tpu.pipeline import _pass_opt

rng = np.random.default_rng(1234)
glen = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
n_reads = int(sys.argv[2]) if len(sys.argv) > 2 else 64
read_len = 4000

genome = testing.random_genome(rng, glen, repeat_frac=0.1, repeat_len=300)
sreads = testing.short_reads(rng, genome, coverage=40.0)
t0 = time.time()
cdbg = B.build_cdbg(sreads, 31, min_count=2)
colors = color_graph(cdbg, sreads)
print(f"graph: {cdbg.n_unitigs} unitigs ({time.time()-t0:.1f}s)", file=sys.stderr)

opt = CorrectOpt(small_k=31, k=63, beam_width=16, batch_regions=512,
                 nb_threads=1, read_batch_bp=64 << 10)
o1 = _pass_opt(opt, 1)
corr = Corrector(cdbg, colors, o1)

reads = []
for i in range(n_reads):
    start = int(rng.integers(0, glen - read_len))
    noisy, _ = testing.noisy_read(rng, genome, start, read_len, err=0.10)
    reads.append(noisy)

# warmup
t0 = time.time()
out = corr.correct_batch(reads[:16])
print(f"warmup {time.time()-t0:.1f}s", file=sys.stderr)

corr.timers = {k: 0.0 for k in corr.timers}
t0 = time.time()
pr = cProfile.Profile()
pr.enable()
reads_np, plans, regions = corr.plan_batch(reads)
corr._execute_regions(regions)
res = corr.assemble_batch(reads_np, None, plans, regions)
pr.disable()
dt = time.time() - t0
print(f"timed: {dt:.2f}s, timers={corr.timers}", file=sys.stderr)
n_open = sum(1 for r in regions if r.kind != "gap")
n_fail = sum(1 for r in regions if not r.ok)
print(f"regions: {len(regions)} total, {n_open} open, {n_fail} failed",
      file=sys.stderr)
st = pstats.Stats(pr, stream=sys.stderr)
st.sort_stats("cumulative").print_stats(35)
