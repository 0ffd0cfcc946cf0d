"""Phasing: TSV loading, collisions, haplotype color filtering."""

import gzip

import numpy as np

from ratatosk_tpu.graph import phasing as PH
from ratatosk_tpu.ops import colorset as CS


def test_load_phasing_and_collisions(tmp_path):
    p = tmp_path / "phase.tsv.gz"
    with gzip.open(p, "wt") as f:
        f.write("r1\t0\tblockA\n")
        f.write("r2\t1\tblockA\n")
        f.write("r3\t0\tblockB\n")
        f.write("r4\t0\tblockA\n")
        f.write("r4\t1\tblockA\n")   # collision -> unphased (Graph.cpp:3552)
    hap = PH.load_phasing([str(p)])
    assert hap.hap_of("r1") == 0           # blockA hap0
    assert hap.hap_of("r2") == 1           # blockA hap1
    assert hap.hap_of("r3") == 2           # blockB hap0
    assert hap.hap_of("r4") == -1          # collided
    assert hap.n_haps == 4


def test_bind_and_filter_colors(tmp_path):
    p = tmp_path / "phase.tsv"
    with open(p, "w") as f:
        f.write("s0\t0\tb\n")
        f.write("s1\t0\tb\n")
        f.write("s2\t1\tb\n")
    hap = PH.load_phasing([str(p)])
    names = ["s0", "s1", "s2", "s3"]       # s3 unphased
    ids = [10, 11, 12, 13]
    PH.bind_colors(hap, names, ids)
    row, _ = CS.make_rows([[10, 11, 12, 13]], 8)
    filt = PH.filter_colors_by_hap(row[0], hap, 0)
    vals = [v for v in filt if v != CS.PAD]
    # hap0 keeps its own reads (10,11) + unphased (13), drops hap1's 12
    assert vals == [10, 11, 13]
    # unphased read keeps everything
    np.testing.assert_array_equal(PH.filter_colors_by_hap(row[0], hap, -1), row[0])
