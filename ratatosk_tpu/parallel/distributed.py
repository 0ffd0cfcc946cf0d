"""Multi-host distribution: the Nextflow scatter/gather layer, TPU-native.

The reference scales across nodes by splitting the long-read FASTQ into ~50
chunks, replicating the index to every node, correcting chunks independently,
and concatenating outputs (Ratatosk_nf/Ratatosk.nf:5-59,139-164,232-248;
SURVEY.md §2.4). Here the same data-parallel structure rides
`jax.distributed`: every process (host) holds a replica of the colored cDBG,
corrects its contiguous shard of the input reads, writes
`<out>.part<pid>.fastq`, and host 0 concatenates. Cross-host aggregation of
correction statistics uses a psum over the global mesh instead of the
reference's filesystem handoff.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> Tuple[int, int]:
    """Initialize jax.distributed from args or JAX_* env vars.

    Returns (process_id, num_processes). Safe to call single-host (no-op).
    """
    import jax
    coordinator = coordinator or os.environ.get("RATATOSK_COORDINATOR")
    if num_processes is None:
        num_processes = int(os.environ.get("RATATOSK_NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("RATATOSK_PROCESS_ID", "0"))
    if num_processes > 1:
        try:
            jax.distributed.initialize(coordinator_address=coordinator,
                                       num_processes=num_processes,
                                       process_id=process_id)
        except RuntimeError as e:
            # already initialized by the launcher (it must run before any
            # backend-touching jax call) — trust the live runtime
            if "already" not in str(e) and "must be called before" not in str(e):
                raise
            assert jax.process_count() == num_processes
            process_id = jax.process_index()
    return process_id, num_processes


def shard_records(n_records: int, process_id: int, num_processes: int
                  ) -> Tuple[int, int]:
    """Contiguous [start, end) record shard for this host (chunk-scatter)."""
    per = (n_records + num_processes - 1) // num_processes
    start = min(process_id * per, n_records)
    return start, min(start + per, n_records)


def part_path(prefix: str, process_id: int) -> str:
    return f"{prefix}.part{process_id}.fastq"


def merge_parts(prefix: str, num_processes: int, final_path: str) -> None:
    """Host-0 gather: concatenate per-host outputs in process order
    (the reference's `cat` merge, Ratatosk.nf:232-248)."""
    with open(final_path, "wb") as out:
        for pid in range(num_processes):
            p = part_path(prefix, pid)
            with open(p, "rb") as f:
                while True:
                    buf = f.read(1 << 20)
                    if not buf:
                        break
                    out.write(buf)
            os.remove(p)


def allreduce_stats(stats: dict) -> dict:
    """Sum integer stats across hosts (device collective over the global
    mesh via process_allgather; doubles as the end-of-shard barrier)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    if jax.process_count() == 1:
        return dict(stats)
    keys = sorted(stats)
    local = jnp.asarray([stats[k] for k in keys], dtype=jnp.int32)
    gathered = np.asarray(multihost_utils.process_allgather(local))
    summed = gathered.sum(axis=0)
    return {k: int(v) for k, v in zip(keys, summed)}


def run_distributed_correct(opt, coordinator=None, num_processes=None,
                            process_id=None) -> None:
    """Per-host slice of the two-pass pipeline (pass 1 shown; the driver in
    pipeline.run_correct handles the pass logic — here we shard its inputs)."""
    from ratatosk_tpu import pipeline
    from ratatosk_tpu.io import fastx

    pid, n = init_distributed(coordinator, num_processes, process_id)
    if n == 1:
        pipeline.run_correct(opt)
        return
    # index every record once (host-side scan), then correct our shard
    recs = list(fastx.read_many(pipeline._expand_file_lists(opt.filename_long_in)))
    a, b = shard_records(len(recs), pid, n)
    import dataclasses
    import tempfile
    shard_file = tempfile.NamedTemporaryFile(
        mode="w", suffix=".fastq", delete=False)
    with shard_file as f:
        for r in recs[a:b]:
            qual = ("".join(chr(c) for c in r.qual) if r.qual is not None
                    else "I" * len(r.codes))
            f.write(f"@{r.name}\n{r.seq}\n+\n{qual}\n")
    sopt = dataclasses.replace(
        opt, filename_long_in=[shard_file.name],
        prefix_filename_out=f"{opt.prefix_filename_out}.part{pid}.tmp")
    pipeline.run_correct(sopt)
    os.replace(f"{sopt.prefix_filename_out}.fastq",
               part_path(opt.prefix_filename_out, pid))
    os.remove(shard_file.name)
    if pid == 0:
        # barrier via collective, then gather
        allreduce_stats({"done": 1})
        merge_parts(opt.prefix_filename_out, n,
                    f"{opt.prefix_filename_out}.fastq")
    else:
        allreduce_stats({"done": 1})
