"""String-set BWT (nvSetBWT analog) + the persistent FM-server loop."""
import io

import numpy as np

from genomics_tpu.index.setbwt import SetFMIndex, serve


def _naive_count(reads, pat):
    return sum(r.count(pat, s) if False else 0 for r, s in [])


def _occurrences(reads, pat):
    out = []
    for ri, r in enumerate(reads):
        start = 0
        while True:
            p = r.find(pat, start)
            if p < 0:
                break
            out.append((ri, p))
            start = p + 1
    return out


def test_set_bwt_count_locate():
    rng = np.random.default_rng(0)
    bases = np.array(list("ACGT"))
    reads = ["".join(bases[rng.integers(0, 4, rng.integers(30, 80))])
             for _ in range(40)]
    idx = SetFMIndex(reads)
    for pat in ["ACG", "TTT", reads[3][5:15], reads[17][:12], "ACGTACGTAC"]:
        want = _occurrences(reads, pat)
        assert idx.count(pat) == len(want), pat
        assert idx.locate(pat, limit=1000) == sorted(want), pat
    # patterns never match across read boundaries
    joined = "".join(reads)
    cross = reads[0][-4:] + reads[1][:4]
    assert cross in joined  # present in the naive concat...
    assert idx.count(cross) == len(_occurrences(reads, cross))  # ...not here


def test_set_bwt_save_load(tmp_path):
    reads = ["ACGTACGT", "GGGTTTAA", "ACGTTTTT"]
    idx = SetFMIndex(reads)
    path = str(tmp_path / "set")
    idx.save(path)
    idx2 = SetFMIndex.load(path)
    for pat in ["ACGT", "TTT", "GG"]:
        assert idx2.count(pat) == idx.count(pat)
        assert idx2.locate(pat) == idx.locate(pat)


def test_fm_server_loop():
    reads = ["ACGTACGT", "TTTTACGT"]
    idx = SetFMIndex(reads)
    out = io.StringIO()
    serve(idx, iter(["ACGT", "", "TTTT", "QUIT", "NEVER"]), out)
    lines = out.getvalue().strip().split("\n")
    assert lines[0].startswith("ACGT\t3")
    assert lines[1].startswith("TTTT\t1")
    assert len(lines) == 2  # QUIT ended the loop before NEVER


def test_fm_server_plain_index_n_guard(tmp_path):
    """A pattern containing 'N' must return 0 matches on a plain
    FMIndex, not crash the persistent server."""
    from genomics_tpu.index.fmindex import FMIndex, save_index
    from genomics_tpu.index.setbwt import load_any_index

    path = str(tmp_path / "plain")
    save_index(FMIndex("ACGTACGTACGTAGGTT"), path)
    idx = load_any_index(path)
    out = io.StringIO()
    serve(idx, iter(["ACGT", "ANG", "QUIT"]), out)
    lines = out.getvalue().strip().split("\n")
    assert lines[0].startswith("ACGT\t3")
    assert lines[1] == "ANG\t0"
