"""Error corrector (nvLighter-class) and SAM output."""
import numpy as np

from genomics_tpu.models.corrector import KmerCorrector
from genomics_tpu.models.mapper import Mapping
from genomics_tpu.utils.samio import write_sam


def test_corrector_fixes_single_errors():
    rng = np.random.default_rng(0)
    genome = "".join(rng.choice(list("ACGT"), 3000))
    reads = [genome[int(p):int(p) + 100]
             for p in rng.integers(0, 2900, 200)]
    corr = KmerCorrector(k=15, trust_threshold=3)
    corr.build(reads)
    fixed = 0
    for _ in range(20):
        p = int(rng.integers(0, 2900))
        clean = genome[p:p + 100]
        pos = int(rng.integers(20, 80))
        bad = list(clean)
        alts = [c for c in "ACGT" if c != bad[pos]]
        bad[pos] = alts[int(rng.integers(0, 3))]
        if corr.correct("".join(bad)) == clean:
            fixed += 1
    assert fixed >= 17


def test_sam_writer(tmp_path):
    p = tmp_path / "out.sam"
    recs = [
        ("r1", "ACGT", Mapping(pos=10, score=8, mapq=42, cigar_string="4M")),
        ("r2", "GGGG", Mapping(pos=-1, score=0, mapq=0, cigar_string="")),
    ]
    write_sam(str(p), "chr1", 1000, recs)
    lines = p.read_text().splitlines()
    assert lines[0].startswith("@HD")
    assert "chr1\t10\t42\t4M" in lines[3].replace(" ", "")
    assert lines[4].split("\t")[1] == "4"  # unmapped flag
