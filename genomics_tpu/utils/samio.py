"""Minimal SAM output (reference: nvbio/io output writes SAM/BAM for
nvBowtie).  Covers the mapper's needs: header + single-end records with
positions, mapq and CIGAR."""
from __future__ import annotations

from typing import Iterable


def write_sam(
    path: str,
    ref_name: str,
    ref_len: int,
    records: Iterable,      # (read_name, seq, Mapping)
) -> None:
    with open(path, "w") as fh:
        fh.write("@HD\tVN:1.6\tSO:unsorted\n")
        fh.write(f"@SQ\tSN:{ref_name}\tLN:{ref_len}\n")
        fh.write("@PG\tID:genomics_tpu\tPN:genomics_tpu\n")
        for name, seq, m in records:
            if m.pos < 0:
                fh.write(f"{name}\t4\t*\t0\t0\t*\t*\t0\t0\t{seq}\t*\n")
            else:
                cig = m.cigar_string or f"{len(seq)}M"
                # SAM M covers both = and X; our byte-CIGAR X maps to M
                cig = cig.replace("X", "M")
                fh.write(
                    f"{name}\t0\t{ref_name}\t{m.pos}\t{m.mapq}\t{cig}"
                    f"\t*\t0\t0\t{seq}\t*\n"
                )
