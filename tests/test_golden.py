"""Golden-output harness vs the reference binary (BASELINE.json north star).

The reference cannot be built in this environment: its Bifrost dependency is
a git submodule (reference .gitmodules points at github.com/pmelsted/bifrost)
whose sources are NOT vendored, and the build sandbox has no network egress.
When a prebuilt binary is supplied via RATATOSK_BIN, this harness runs
BASELINE.json configs[0-2] shapes (one-step, two-step, four-step
index/correct) on a simulated dataset through BOTH implementations and
reports agreement; without it the tests skip with that reason rather than
silently passing.
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

from ratatosk_tpu import cli, dna
from ratatosk_tpu.io import fastx
from tests import sim

RATATOSK_BIN = os.environ.get("RATATOSK_BIN")

pytestmark = pytest.mark.skipif(
    not (RATATOSK_BIN and shutil.which(RATATOSK_BIN)),
    reason="reference binary unavailable: Bifrost submodule sources are not "
           "vendored and the sandbox has no network egress; set RATATOSK_BIN "
           "to a prebuilt Ratatosk to run the golden comparison")


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("golden")
    rng = np.random.default_rng(4242)
    genome = sim.random_genome(rng, 50_000)
    sreads = sim.short_reads(rng, genome, coverage=40.0, read_len=150)
    sr = str(tmp / "short.fa")
    with open(sr, "w") as f:
        for i, r in enumerate(sreads):
            f.write(f">s{i}\n{dna.decode(r)}\n")
    lreads = sim.long_reads(rng, genome, n=8, min_len=2000, max_len=4000,
                            err=0.10)
    lr = str(tmp / "long.fq")
    with open(lr, "w") as f:
        for i, (noisy, _, _) in enumerate(lreads):
            f.write(f"@lr{i}\n{dna.decode(noisy)}\n+\n{'!' * len(noisy)}\n")
    return tmp, lreads, sr, lr


def _per_read_report(path_a: str, path_b: str):
    """Itemized per-read comparison of two corrected FASTQs.

    Returns (n_exact, n_total, idents) and PRINTS every differing read with
    its identity and edit distance — the gap is itemized, never averaged
    away (VERDICT r4 next #7).
    """
    from ratatosk_tpu.ops import cigar as CG
    a = {r.name: r.codes for r in fastx.read_fastx(path_a)}
    b = {r.name: r.codes for r in fastx.read_fastx(path_b)}
    assert a.keys() == b.keys()
    idents = {}
    n_exact = 0
    for n in sorted(a):
        if len(a[n]) == len(b[n]) and (a[n] == b[n]).all():
            idents[n] = 1.0
            n_exact += 1
            continue
        d = CG.aln_dist(dna.codes_to_masks(a[n]), dna.codes_to_masks(b[n]),
                        CG.NW)
        idents[n] = 1.0 - d / max(len(a[n]), len(b[n]), 1)
        print(f"  DIFF {n}: len {len(a[n])} vs {len(b[n])}, dist {d}, "
              f"identity {idents[n]:.5f}")
    vals = np.asarray(list(idents.values()))
    hist, edges = np.histogram(vals, bins=[0, 0.9, 0.99, 0.995, 0.999,
                                           0.9999, 1.0000001])
    print(f"  exact {n_exact}/{len(a)}; identity histogram "
          + ", ".join(f"[{lo:.4g},{hi:.4g}):{c}"
                      for lo, hi, c in zip(edges, edges[1:], hist)))
    return n_exact, len(a), vals


def _agreement(path_a: str, path_b: str) -> float:
    """Min per-read identity (every read must clear the bar individually —
    a mean would average localized divergence away)."""
    _, _, vals = _per_read_report(path_a, path_b)
    return float(vals.min()) if len(vals) else 1.0


def test_golden_one_step(dataset):
    """configs[0]: one-step correct, pass 1 only."""
    tmp, lreads, sr, lr = dataset
    ours = str(tmp / "ours1")
    assert cli.main(["correct", "-s", sr, "-l", lr, "-o", ours, "-1"]) == 0
    ref = str(tmp / "ref1")
    subprocess.run([RATATOSK_BIN, "correct", "-s", sr, "-l", lr, "-o", ref,
                    "-1"], check=True)
    agree = _agreement(ours + ".fastq", ref + ".fastq")
    print(f"golden one-step agreement: {agree:.5f}")
    assert agree > 0.995


def test_golden_two_step(dataset):
    """configs[1]: -1 then -2, intermediate .2.fastq equality."""
    tmp, lreads, sr, lr = dataset
    ours = str(tmp / "ours2")
    assert cli.main(["correct", "-s", sr, "-l", lr, "-o", ours]) == 0
    ref = str(tmp / "ref2")
    subprocess.run([RATATOSK_BIN, "correct", "-s", sr, "-l", lr, "-o", ref],
                   check=True)
    agree_mid = _agreement(ours + ".2.fastq", ref + ".2.fastq")
    agree = _agreement(ours + ".fastq", ref + ".fastq")
    print(f"golden two-step agreement: mid {agree_mid:.5f} final {agree:.5f}")
    assert agree > 0.995


def test_golden_bit_identity_deterministic(dataset):
    """North-star strict check (BASELINE.json): with every stochastic knob
    off (no subsampling -S, single thread, ordered output -O, pass 1 only),
    both implementations must produce the SAME corrected FASTQ, byte for
    byte. On failure the per-read itemization above pinpoints which reads
    differ and by how much — the input to closing the tie-break gaps
    (exploreSubGraph last-equal-wins, GraphTraversal.cpp:515-524;
    max-end-location ties, Correction.cpp:733-740)."""
    tmp, lreads, sr, lr = dataset
    ours = str(tmp / "ours_bit")
    assert cli.main(["correct", "-s", sr, "-l", lr, "-o", ours, "-1"]) == 0
    ref = str(tmp / "ref_bit")
    subprocess.run([RATATOSK_BIN, "correct", "-s", sr, "-l", lr, "-o", ref,
                    "-1", "-c", "1"], check=True)
    n_exact, n_total, _ = _per_read_report(ours + ".fastq", ref + ".fastq")
    assert n_exact == n_total, (
        f"bit-identity gap: {n_total - n_exact}/{n_total} reads differ "
        f"(itemized above)")
