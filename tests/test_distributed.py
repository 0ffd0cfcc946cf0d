"""Distribution-layer helpers (single-process parts)."""

import numpy as np

from ratatosk_tpu.parallel import distributed as D


def test_shard_records_cover_and_disjoint():
    for n, p in [(100, 4), (7, 3), (3, 8), (50, 1)]:
        spans = [D.shard_records(n, i, p) for i in range(p)]
        covered = []
        for a, b in spans:
            assert 0 <= a <= b <= n
            covered.extend(range(a, b))
        assert covered == list(range(n))


def test_merge_parts(tmp_path):
    prefix = str(tmp_path / "out")
    for pid, content in enumerate([b"@r0\nACGT\n+\nIIII\n", b"@r1\nGGTT\n+\nIIII\n"]):
        with open(D.part_path(prefix, pid), "wb") as f:
            f.write(content)
    final = str(tmp_path / "final.fastq")
    D.merge_parts(prefix, 2, final)
    data = open(final, "rb").read()
    assert data == b"@r0\nACGT\n+\nIIII\n@r1\nGGTT\n+\nIIII\n"
    import os
    assert not os.path.exists(D.part_path(prefix, 0))


def test_allreduce_stats_single_process():
    out = D.allreduce_stats({"reads": 5, "bases": 100})
    assert out == {"reads": 5, "bases": 100}
