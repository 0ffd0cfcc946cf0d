"""Aux subsystems: structured tracing (trace.py) and distributed shard
retry/resume (the Nextflow maxRetries/resume analog,
Ratatosk_nf/nextflow.config:63-82)."""

import json
import os

import numpy as np
import pytest

from ratatosk_tpu import dna
from ratatosk_tpu.config import CorrectOpt
from ratatosk_tpu.parallel.distributed import _correct_with_retry
from tests import sim


def test_trace_jsonl_events(tmp_path):
    from ratatosk_tpu import pipeline
    rng = np.random.default_rng(1700)
    genome = sim.random_genome(rng, 6000)
    sreads = sim.short_reads(rng, genome, coverage=40.0, read_len=100)
    sr = tmp_path / "s.fa"
    with open(sr, "w") as f:
        for i, r in enumerate(sreads):
            f.write(f">s{i}\n{dna.decode(r)}\n")
    lr = tmp_path / "l.fq"
    noisy, _, _ = sim.long_reads(rng, genome, n=2, min_len=1200,
                                 max_len=1500, err=0.08)[0]
    with open(lr, "w") as f:
        f.write(f"@r0\n{dna.decode(noisy)}\n+\n{'!' * len(noisy)}\n")
    trace = str(tmp_path / "trace.jsonl")
    opt = CorrectOpt(small_k=17, k=31, filename_seq_in=[str(sr)],
                     filename_long_in=[str(lr)],
                     prefix_filename_out=str(tmp_path / "out"),
                     beam_width=8, batch_regions=16, trace_json=trace)
    pipeline.run_correct(opt)
    events = [json.loads(l) for l in open(trace)]
    names = [e["ev"] for e in events]
    assert "batch" in names and "pass_done" in names
    assert "rescue" in names and "snp" in names
    done = [e for e in events if e["ev"] == "pass_done"]
    assert {d["pass_no"] for d in done} == {1, 2}
    assert all("ts" in e for e in events)


def test_shard_retry_and_resume(tmp_path):
    part = str(tmp_path / "part0.fastq")
    opt = CorrectOpt(shard_retries=2)
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient")
        with open(part, "w") as f:
            f.write("@x\nA\n+\n!\n")

    _correct_with_retry(opt, flaky, part)
    assert calls["n"] == 3
    assert os.path.exists(part + ".done")

    # resume: a completed shard is skipped entirely
    _correct_with_retry(opt, flaky, part)
    assert calls["n"] == 3

    # exhausted budget propagates
    opt2 = CorrectOpt(shard_retries=1)

    def always_fails():
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError):
        _correct_with_retry(opt2, always_fails, str(tmp_path / "p1.fastq"))
