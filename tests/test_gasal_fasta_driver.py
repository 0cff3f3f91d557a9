"""End-to-end GASAL2 test_prog-style driver over the bundled reads
(subset — the full 20k run is the benchmark's job)."""
import os

import numpy as np
import pytest

from genomics_tpu.core import golds
from genomics_tpu.core.scoring import AlignmentParams
from genomics_tpu.models.aligner import align_fasta_pairs

QB = "/root/reference/CDP/GASAL2/test_prog/query_batch.fasta"


@pytest.mark.skipif(not os.path.exists(QB), reason="reference not mounted")
def test_fasta_driver_bundled_reads(tmp_path):
    # target batch is a missing blob upstream; pair consecutive reads of
    # the query batch as query/target (valid alignment jobs either way)
    from genomics_tpu.utils.fasta import read_fasta

    recs = read_fasta(QB, with_ops=True)[:80]
    qf = tmp_path / "q.fasta"
    tf = tmp_path / "t.fasta"
    with open(qf, "w") as f1, open(tf, "w") as f2:
        for i in range(0, 80, 2):
            f1.write(f">{recs[i].name}\n{recs[i].seq}\n")
            f2.write(f">{recs[i+1].name}\n{recs[i+1].seq}\n")
    P = AlignmentParams()
    jobs = align_fasta_pairs(str(qf), str(tf), params=P, with_tb=True)
    assert len(jobs) == 40
    for k in (0, 13, 39):
        g = golds.local_align(recs[2 * k].seq, recs[2 * k + 1].seq, P)
        assert jobs[k].score == g["score"]
