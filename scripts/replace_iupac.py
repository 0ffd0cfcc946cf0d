#!/usr/bin/env python3
"""Replace IUPAC ambiguity characters in a FASTA/FASTQ with concrete bases.

Counterpart of the reference's scripts/replaceIUPAC.py (component 19,
SURVEY.md §2.1): corrected reads may contain ambiguity codes at unresolved SNP
sites; downstream tools that reject them get a uniformly random concrete base
drawn from the code's allowed set.

Usage: replace_iupac.py <in.fastx[.gz]> <out.fastx> [seed]
"""

import gzip
import random
import sys

AMBIG = {
    "M": "AC", "R": "AG", "S": "CG", "V": "ACG", "W": "AT", "Y": "CT",
    "H": "ACT", "K": "GT", "D": "AGT", "B": "CGT", "N": "ACGT",
}


def _open(path, mode="rt"):
    return gzip.open(path, mode) if path.endswith(".gz") else open(path, mode)


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__, file=sys.stderr)
        return 1
    rng = random.Random(int(sys.argv[3]) if len(sys.argv) > 3 else 0)
    with _open(sys.argv[1]) as fin, _open(sys.argv[2], "wt") as fout:
        is_fastq = None
        lineno = 0
        for line in fin:
            if is_fastq is None:
                is_fastq = line.startswith("@")
            # sequence lines: FASTQ = line 2 of each 4; FASTA = non-header
            is_seq = ((lineno % 4 == 1) if is_fastq
                      else not line.startswith(">"))
            if is_seq:
                line = "".join(
                    rng.choice(AMBIG[c.upper()])
                    if c.upper() in AMBIG else c
                    for c in line.rstrip("\n")) + "\n"
            fout.write(line)
            lineno += 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
