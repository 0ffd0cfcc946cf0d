"""IO layer: python and native parsers must agree; writer round-trips."""

import gzip

import numpy as np
import pytest

from ratatosk_tpu import dna
from ratatosk_tpu.io import fastx, native


def _write_files(tmp_path, rng):
    seqs = ["".join(rng.choice(list("ACGTN"), size=int(rng.integers(50, 300))))
            for _ in range(25)]
    fq = str(tmp_path / "x.fastq")
    with open(fq, "w") as f:
        for i, s in enumerate(seqs):
            q = "".join(chr(33 + int(rng.integers(0, 41))) for _ in s)
            f.write(f"@read{i} extra comment\n{s}\n+\n{q}\n")
    fa_gz = str(tmp_path / "y.fasta.gz")
    with gzip.open(fa_gz, "wt") as f:
        for i, s in enumerate(seqs):
            # multi-line fasta
            f.write(f">ref{i}\n{s[:60]}\n{s[60:]}\n")
    return seqs, fq, fa_gz


def test_python_parser_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    seqs, fq, fa_gz = _write_files(tmp_path, rng)
    recs = list(fastx.read_fastx(fq, prefer_native=False))
    assert len(recs) == len(seqs)
    for r, s in zip(recs, seqs):
        assert dna.decode(r.codes) == s.upper().replace("N", "N")
        assert r.qual is not None and len(r.qual) == len(s)
    recs2 = list(fastx.read_fastx(fa_gz, prefer_native=False))
    assert [dna.decode(r.codes) for r in recs2] == [dna.decode(r.codes) for r in recs]
    assert recs2[0].qual is None


def test_native_matches_python(tmp_path):
    if not native.available():
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(2)
    seqs, fq, fa_gz = _write_files(tmp_path, rng)
    for path in (fq, fa_gz):
        py = list(fastx.read_fastx(path, prefer_native=False))
        nt = list(native.read_records(path))
        assert [r.name for r in py] == [r.name for r in nt]
        for a, b in zip(py, nt):
            np.testing.assert_array_equal(a.codes, b.codes)
            if a.qual is None:
                assert b.qual is None or (b.qual == 0).all()
            else:
                np.testing.assert_array_equal(a.qual, b.qual)


def test_native_small_batches(tmp_path):
    if not native.available():
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(3)
    seqs, fq, _ = _write_files(tmp_path, rng)
    # tiny batch buffer forces the pending-record path
    recs = list(native.read_records(fq, batch_bp=512, max_records=3))
    assert len(recs) == len(seqs)
    py = list(fastx.read_fastx(fq, prefer_native=False))
    for a, b in zip(py, recs):
        np.testing.assert_array_equal(a.codes, b.codes)


def test_writer_trim_split(tmp_path):
    out = str(tmp_path / "o.fastq")
    codes = dna.encode("ACGT" * 30)
    qual = np.full(120, 33 + 40, dtype=np.uint8)
    qual[50:60] = 33  # low-quality gap splits the read
    with fastx.FastqWriter(out, trim_qual=20, min_len=20) as w:
        w.write("r", codes, qual)
    recs = list(fastx.read_fastx(out, prefer_native=False))
    # sub-read ids start at /1 (Ratatosk.cpp:528 id_subread = 1)
    assert [r.name for r in recs] == ["r/1", "r/2"]
    assert len(recs[0].codes) == 50 and len(recs[1].codes) == 60
