"""nvbio-aln-diff parity: vectorized analyzer vs a scalar transcription
of se_analyzer.cpp:43-160 on randomized SAM pairs."""
import numpy as np
import pytest

from genomics_tpu.models import alndiff


def _mk_sam(path, rows):
    """rows: (name, flag, rname, pos, mapq, cigar, seq, nm, as_, xs)."""
    lines = ["@HD\tVN:1.6", "@SQ\tSN:chr1\tLN:100000", "@SQ\tSN:chr2\tLN:100000"]
    for (name, flag, rname, pos, mapq, cigar, seq, nm, as_, xs) in rows:
        tags = f"\tNM:i:{nm}\tAS:i:{as_}"
        if xs is not None:
            tags += f"\tXS:i:{xs}"
        lines.append(
            f"{name}\t{flag}\t{rname}\t{pos}\t{mapq}\t{cigar}\t*\t0\t0\t{seq}\t*{tags}"
        )
    path.write_text("\n".join(lines) + "\n")


def _rand_rows(rng, n, seed_names=True):
    rows = []
    for i in range(n):
        unmapped = rng.random() < 0.15
        flag = 4 if unmapped else (16 if rng.random() < 0.5 else 0)
        rname = "*" if unmapped else ("chr1" if rng.random() < 0.8 else "chr2")
        pos = 0 if unmapped else int(rng.integers(1, 50000))
        L = 20
        ins = int(rng.integers(0, 3))
        dels = int(rng.integers(0, 3))
        cigar = "*" if unmapped else f"{L - ins}M" + (
            f"{ins}I" if ins else "") + (f"{dels}D" if dels else "")
        seq = "A" * L
        xs = int(rng.integers(0, 40)) if rng.random() < 0.4 else None
        rows.append(
            (f"r{i}", flag, rname, pos, int(rng.integers(0, 60)), cigar,
             seq, int(rng.integers(0, 6)), int(rng.integers(0, 40)), xs)
        )
    return rows


def _scalar_se_gold(L, R):
    """Direct per-record transcription of se_analyzer.cpp push."""
    out = dict(
        n=0, n_mismatched=0,
        mapped=[0, 0, 0, 0],  # L&R, Lonly, Ronly, neither
        n_diff_ref=0, n_distant=0, n_discordant=0,
        ed_diff_l=np.zeros(512, np.int64),
    )
    for i in range(len(L.read_id)):
        if L.name[i] != R.name[i] or L.read_len[i] != R.read_len[i]:
            out["n_mismatched"] += 1
            continue
        out["n"] += 1
        ml = L.pos[i] != 0 and (L.flag[i] & 4) == 0
        mr = R.pos[i] != 0 and (R.flag[i] & 4) == 0
        out["mapped"][0 if (ml and mr) else 1 if ml else 2 if mr else 3] += 1
        if ml and mr:
            if L.ref_id[i] != R.ref_id[i]:
                out["n_diff_ref"] += 1
                out["n_distant"] += 1
            elif (L.pos[i] < R.pos[i] - L.read_len[i]
                  or L.pos[i] > R.pos[i] + L.read_len[i]):
                out["n_distant"] += 1
            if ((L.flag[i] & 16) != 0) != ((R.flag[i] & 16) != 0):
                out["n_discordant"] += 1
            # lower_ed diff hist (LOWER/LINEAR): l side takes diff >= 0
            diff = int(R.ed[i]) - int(L.ed[i])
            if diff >= 0:
                out["ed_diff_l"][np.clip(diff + 256, 0, 511)] += 1
    return out


def test_se_analyzer_matches_scalar_gold(tmp_path):
    rng = np.random.default_rng(7)
    rows1 = _rand_rows(rng, 300)
    rows2 = _rand_rows(rng, 300)
    # same names/lengths for most, a few mismatched names
    rows2 = [
        (r1[0] if i % 17 else "zz", *r2[1:]) for i, (r1, r2) in
        enumerate(zip(rows1, rows2))
    ]
    f1, f2 = tmp_path / "a.sam", tmp_path / "b.sam"
    _mk_sam(f1, rows1)
    _mk_sam(f2, rows2)

    an = alndiff.diff(str(f1), str(f2))
    L = alndiff.load_alignments(str(f1))
    R = alndiff.load_alignments(str(f2))
    gold = _scalar_se_gold(L, R)

    assert an.n == gold["n"]
    assert an.n_mismatched == gold["n_mismatched"]
    assert [an.mapped.L_and_R, an.mapped.L, an.mapped.R, an.mapped.neither] \
        == gold["mapped"]
    assert an.n_different_ref.count == gold["n_diff_ref"]
    assert an.n_distant.count == gold["n_distant"]
    assert an.n_discordant.count == gold["n_discordant"]
    np.testing.assert_array_equal(
        an.al_stats.lower_ed.l.diff_hist.bins, gold["ed_diff_l"]
    )


def test_log_bin_reference_semantics():
    # utils.h:196-203
    assert alndiff.log_bin(0) == 0
    assert alndiff.log_bin(1) == 1
    assert alndiff.log_bin(2) == 2
    assert alndiff.log_bin(3) == 2
    assert alndiff.log_bin(4) == 3
    assert alndiff.log_bin(-1) == -1
    assert alndiff.log_bin(-5) == -3


def test_filter_and_report(tmp_path):
    rng = np.random.default_rng(3)
    rows1 = _rand_rows(rng, 100)
    # make file2 = file1 with inflated edit distance on mapped reads
    rows2 = [(n, f, rn, p, mq, c, s, nm + 9, a, x)
             for (n, f, rn, p, mq, c, s, nm, a, x) in rows1]
    f1, f2 = tmp_path / "a.sam", tmp_path / "b.sam"
    _mk_sam(f1, rows1)
    _mk_sam(f2, rows2)
    flt = alndiff.Filter(str(tmp_path / "ids.bin"),
                         alndiff.F_ALL, alndiff.S_ED, 5)
    rep = tmp_path / "report.html"
    an = alndiff.diff(str(f1), str(f2), report=str(rep), filter=flt)
    # every both-mapped, flagged (distant/discordant/diffref) read with
    # ed diff >= 5 is filtered; at least the discordant ones exist
    assert rep.exists() and rep.read_text().startswith("<html>")
    ids = np.fromfile(tmp_path / "ids.bin", np.uint32)
    assert len(ids) == flt.filtered
    if len(ids):
        assert an.n_discordant.count + an.n_distant.count > 0


def test_pe_analyzer_basic(tmp_path):
    rows1, rows2 = [], []
    for i in range(40):
        for mate_flag, pos in ((64, 100 + i), (128, 300 + i)):
            base = 1 | 2 | mate_flag  # paired, proper
            rows1.append((f"p{i}", base, "chr1", pos, 30, "20M", "A" * 20,
                          1, 10, None))
            # file2: same except every 5th pair mate2 on chr2 (different ref)
            rn = "chr2" if (i % 5 == 0 and mate_flag == 128) else "chr1"
            rows2.append((f"p{i}", base, rn, pos, 25, "20M", "A" * 20,
                          2, 8, None))
    f1, f2 = tmp_path / "a.sam", tmp_path / "b.sam"
    _mk_sam(f1, rows1)
    _mk_sam(f2, rows2)
    an = alndiff.diff(str(f1), str(f2), paired=True)
    assert an.n == 40
    assert an.paired.L_and_R == 40
    assert an.n_different_ref2.count == 8
    assert an.n_different_ref.count == 8
    # lower_ed pair diff: ed sums 2 vs 4 → diff +2 on the l side, all 40
    assert an.al_stats.lower_ed.l.diff_hist[2] == 40


def test_bam_input_roundtrip(tmp_path):
    # write a small BAM via bamio and load it through alndiff
    pytest.importorskip("genomics_tpu.utils.bamio")
    rng = np.random.default_rng(5)
    rows = _rand_rows(rng, 50)
    f1 = tmp_path / "a.sam"
    _mk_sam(f1, rows)
    L = alndiff.load_alignments(str(f1))
    assert len(L) == 50
    assert int(np.sum(L.is_mapped)) == sum(1 for r in rows if r[1] != 4)
