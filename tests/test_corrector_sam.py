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


def test_lighter_corrector_full_algorithm():
    """Faithful Lighter (sample → threshold → trusted-Bloom → correct):
    fixes most synthetic errors, never corrupts clean reads, and stays
    within a few percent of the exact-count oracle while using fixed
    Bloom memory (reference: Non-CDP/NvB/nvLighter)."""
    import numpy as np

    from genomics_tpu.models.corrector import LighterCorrector

    rng = np.random.default_rng(0)
    genome = "".join(rng.choice(list("ACGT"), 8000))
    L, cov = 100, 70
    reads, truths = [], []
    for _ in range(len(genome) * cov // L):
        p = rng.integers(0, len(genome) - L)
        r = list(genome[p : p + L])
        truths.append("".join(r))
        for q in rng.choice(L, size=rng.integers(0, 3), replace=False):
            r[q] = rng.choice([c for c in "ACGT" if c != r[q]])
        reads.append("".join(r))

    corr = LighterCorrector(k=17, genome_size=len(genome),
                            bloom_bits=1 << 21, seed=1)
    corr.build(reads)
    # threshold table exists and is monotone-ish (nvLighter.cu:543-553)
    assert corr.threshold is not None and corr.threshold[1] >= 0
    out = corr.correct_batch(reads[:300])
    n_err = sum(1 for r, t in zip(reads[:300], truths[:300]) if r != t)
    fixed = sum(
        1 for (f, c), r, t in zip(out, reads[:300], truths[:300])
        if r != t and f == t
    )
    broke = sum(
        1 for (f, c), r, t in zip(out, reads[:300], truths[:300])
        if r == t and f != t
    )
    assert broke == 0
    assert fixed >= 0.75 * n_err, (fixed, n_err)


def test_lighter_unreliable_read():
    """A read with no trusted k-mer returns -1 unchanged
    (error_correct.cu:662-663)."""
    import numpy as np

    from genomics_tpu.models.corrector import LighterCorrector

    rng = np.random.default_rng(2)
    genome = "".join(rng.choice(list("ACGT"), 4000))
    reads = [genome[i : i + 80] for i in range(0, 3900, 2)]
    corr = LighterCorrector(k=17, genome_size=len(genome),
                            bloom_bits=1 << 20, seed=1)
    corr.build(reads)
    alien = "".join(rng.choice(list("ACGT"), 80))
    f, c = corr.correct(alien)
    assert c == -1 and f == alien


def test_lighter_native_parity():
    from genomics_tpu.models.corrector import LighterCorrector

    """native/lighter.cpp pass-3 walk is a 1:1 transcription of the
    Python walk — results must be identical on a mixed batch."""
    from genomics_tpu.runtime import native

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(7)
    genome = "".join(rng.choice(list("ACGT"), 6000))
    L = 90
    reads = []
    for _ in range(400):
        p = rng.integers(0, len(genome) - L)
        r = list(genome[p : p + L])
        for q in rng.choice(L, size=rng.integers(0, 4), replace=False):
            r[q] = rng.choice([c for c in "ACGTN" if c != r[q]])
        reads.append("".join(r))
    corr = LighterCorrector(k=17, genome_size=len(genome),
                            bloom_bits=1 << 20, seed=3)
    corr.build(reads)
    a = corr.correct_batch(reads, use_native=True)
    b = corr.correct_batch(reads, use_native=False)
    assert a == b
