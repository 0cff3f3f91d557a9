#!/usr/bin/env python
"""End-to-end demo: the production pipeline over one simulated dataset.

  simulate genome + reads
    → k-mer error correction      (models.corrector, nvLighter-class)
    → read mapping to reference   (models.mapper, nvBowtie-class)
    → SAM output                  (utils.samio)
    → duplicate-read clustering   (models.cluster, CD-HIT-class)
    → PairHMM genotyping scores   (models.pairhmm, GATK-class)

Runs on any backend (compiled Pallas kernels on TPU).
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_reads=200, read_len=100, genome_len=20000, seed=0):
    rng = np.random.default_rng(seed)
    genome = "".join(rng.choice(list("ACGT"), genome_len))

    # simulate reads: substitution errors ~1%
    reads, truth = [], []
    for _ in range(n_reads):
        p = int(rng.integers(0, genome_len - read_len))
        r = list(genome[p : p + read_len])
        for k in range(read_len):
            if rng.random() < 0.01:
                r[k] = rng.choice(list("ACGT"))
        reads.append("".join(r))
        truth.append(p)
    print(f"simulated {n_reads} reads of {read_len}bp from {genome_len}bp genome")

    # 1. error correction
    from genomics_tpu.models.corrector import KmerCorrector

    corr = KmerCorrector(k=15, trust_threshold=3)
    corr.build(reads)
    corrected = corr.correct_batch(reads)
    n_changed = sum(a != b for a, b in zip(reads, corrected))
    print(f"corrector: modified {n_changed} reads")

    # 2. mapping
    from genomics_tpu.models.mapper import ReadMapper

    mapper = ReadMapper(genome)
    maps = mapper.map_batch(corrected)
    correct = sum(
        abs(m.pos - 1 - t) <= 2 for m, t in zip(maps, truth) if m.pos >= 0
    )
    print(f"mapper: {sum(m.pos >= 0 for m in maps)}/{n_reads} mapped, "
          f"{correct}/{n_reads} at true locus")

    # 3. SAM
    from genomics_tpu.utils.samio import write_sam

    write_sam(
        "/tmp/pipeline_demo.sam", "sim1", genome_len,
        [(f"read{i}", r, m) for i, (r, m) in enumerate(zip(corrected, maps))],
    )
    print("wrote /tmp/pipeline_demo.sam")

    # 4. clustering of duplicate loci
    from genomics_tpu.models.cluster import cluster_reads

    res = cluster_reads(corrected, threshold=0.9, speculate=4)
    print(f"cluster: {res.n_clusters} clusters from {n_reads} reads")

    # 5. PairHMM of each read vs its mapped reference window
    from genomics_tpu.models.pairhmm import compute_likelihoods

    records = []
    for r, m in zip(corrected, maps):
        if m.pos < 0:
            continue
        s = max(0, m.pos - 1 - 5)
        hap = genome[s : s + read_len + 10]
        records.append(
            dict(read=r, hap=hap,
                 base_quals=np.full(len(r), 30),
                 ins_quals=np.full(len(r), 40),
                 del_quals=np.full(len(r), 40))
        )
    ph = compute_likelihoods(records)
    print(f"pairhmm: {len(records)} likelihoods, {ph.gcups:.2f} GCUPS, "
          f"median {np.median(ph.likelihoods):.3e}")
    print("pipeline complete")


if __name__ == "__main__":
    main()
