"""CLI + two-pass pipeline on simulated files (configs[0-2] of BASELINE.json:
one-step, two-step, and index/correct split)."""

import gzip
import os

import numpy as np
import pytest

from ratatosk_tpu import cli, dna
from ratatosk_tpu.io import fastx
from tests import sim

K1, K2 = 17, 31


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("data")
    rng = np.random.default_rng(200)
    genome = sim.random_genome(rng, 10000)
    sreads = sim.short_reads(rng, genome, coverage=40.0, read_len=100)
    sr_path = str(tmp / "short.fasta.gz")
    with gzip.open(sr_path, "wt") as f:
        for i, r in enumerate(sreads):
            f.write(f">sr{i}\n{dna.decode(r)}\n")
    lreads = sim.long_reads(rng, genome, n=3, min_len=1500, max_len=2500, err=0.09)
    lr_path = str(tmp / "long.fastq")
    with open(lr_path, "w") as f:
        for i, (noisy, _, _) in enumerate(lreads):
            f.write(f"@lr{i}\n{dna.decode(noisy)}\n+\n{'!' * len(noisy)}\n")
    return tmp, genome, lreads, sr_path, lr_path


def _errors(out_path, lreads):
    recs = {r.name: r for r in fastx.read_fastx(out_path)}
    errs = []
    for i, (_, true, _) in enumerate(lreads):
        r = recs[f"lr{i}"]
        errs.append(sim.error_rate(r.codes, true))
    return np.mean(errs)


def test_one_step_correct(dataset):
    tmp, genome, lreads, sr, lr = dataset
    out = str(tmp / "one")
    rc = cli.main(["correct", "-s", sr, "-l", lr, "-o", out,
                   "-k", str(K1), "-K", str(K2), "-1",
                   "--beam-width", "8", "--batch-regions", "32"])
    assert rc == 0
    assert os.path.exists(out + ".fastq")
    raw = np.mean([sim.error_rate(n, t) for n, t, _ in lreads])
    cor = _errors(out + ".fastq", lreads)
    assert cor < raw / 4, f"{cor:.4f} vs raw {raw:.4f}"


def test_two_pass_correct(dataset):
    tmp, genome, lreads, sr, lr = dataset
    out = str(tmp / "two")
    rc = cli.main(["correct", "-s", sr, "-l", lr, "-o", out,
                   "-k", str(K1), "-K", str(K2), "-C", "500",
                   "--beam-width", "8", "--batch-regions", "32"])
    assert rc == 0
    assert os.path.exists(out + ".2.fastq")   # pass-1 intermediate
    assert os.path.exists(out + ".fastq")     # final
    raw = np.mean([sim.error_rate(n, t) for n, t, _ in lreads])
    mid = _errors(out + ".2.fastq", lreads)
    cor = _errors(out + ".fastq", lreads)
    assert mid < raw / 4
    assert cor < raw / 4
    # pass 2 must not undo pass 1
    assert cor <= mid * 1.5 + 1e-9


def test_two_pass_correct_k63(dataset):
    """Default-shaped pass-2: k2=63 exercises the two-word key path through
    build/color/seeds/beam end-to-end (reference default, Common.hpp:117)."""
    tmp, genome, lreads, sr, lr = dataset
    out = str(tmp / "k63")
    rc = cli.main(["correct", "-s", sr, "-l", lr, "-o", out,
                   "-k", "21", "-K", "63", "-C", "500",
                   "--beam-width", "8", "--batch-regions", "32"])
    assert rc == 0
    raw = np.mean([sim.error_rate(n, t) for n, t, _ in lreads])
    mid = _errors(out + ".2.fastq", lreads)
    cor = _errors(out + ".fastq", lreads)
    assert mid < raw / 4
    assert cor < raw / 4
    assert cor <= mid * 1.5 + 1e-9


def test_index_then_correct(dataset):
    tmp, genome, lreads, sr, lr = dataset
    out = str(tmp / "four")
    rc = cli.main(["index", "-s", sr, "-l", lr, "-o", out,
                   "-k", str(K1), "-K", str(K2), "-1"])
    assert rc == 0
    idx = f"{out}.index.k{K1}.npz"
    assert os.path.exists(idx)
    rc = cli.main(["correct", "-g", idx, "-l", lr, "-o", out, "-1",
                   "-k", str(K1), "-K", str(K2),
                   "--beam-width", "8", "--batch-regions", "32"])
    assert rc == 0
    raw = np.mean([sim.error_rate(n, t) for n, t, _ in lreads])
    cor = _errors(out + ".fastq", lreads)
    assert cor < raw / 4


def test_trim_split(dataset, tmp_path):
    tmp, genome, lreads, sr, lr = dataset
    out = str(tmp_path / "trim")
    rc = cli.main(["correct", "-s", sr, "-l", lr, "-o", out, "-1",
                   "-k", str(K1), "-K", str(K2), "-t", "35",
                   "--beam-width", "8", "--batch-regions", "32"])
    assert rc == 0
    recs = list(fastx.read_fastx(out + ".fastq"))
    assert recs, "trim/split produced no sub-reads"
    for r in recs:
        assert "/" in r.name                     # name/i sub-read naming
        assert len(r.codes) >= K2                # min length = k
        assert (r.qual >= 33 + 35).all()         # all quals >= threshold


def test_pipelined_threads_match_sequential(dataset, tmp_path):
    """-c 2 double-buffers planning against device execution; output must be
    bit-identical to the sequential path."""
    tmp, genome, lreads, sr, lr = dataset
    outs = {}
    for c in (1, 2):
        out = str(tmp_path / f"thr{c}")
        rc = cli.main(["correct", "-s", sr, "-l", lr, "-o", out, "-1",
                       "-k", str(K1), "-K", str(K2), "-c", str(c),
                       "--beam-width", "8", "--batch-regions", "32"])
        assert rc == 0
        outs[c] = open(out + ".fastq").read()
    assert outs[1] == outs[2]


def test_version_and_cite(capsys):
    assert cli.main(["--version"]) == 0
    assert cli.main(["--cite"]) == 0
