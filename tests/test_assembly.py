"""Local micro-assembly tests (nvMicroAssembly / HaplotypeCaller
pipeline: de Bruijn graph → k-best haplotypes → PairHMM scoring →
variant events)."""
import numpy as np

from genomics_tpu.models import assembly


def _reads_from(hap: str, n: int, L: int, rng) -> list[str]:
    return [
        hap[p : p + L]
        for p in rng.integers(0, len(hap) - L, n)
    ]


def test_graph_recovers_snv_haplotype():
    rng = np.random.default_rng(0)
    ref = "".join(rng.choice(list("ACGT"), assembly.ACTIVE_REGION))
    alt = ref[:50] + ("A" if ref[50] != "A" else "C") + ref[51:]
    reads = _reads_from(alt, 60, 40, rng)
    haps = assembly.assemble_region(ref, reads)
    assert any(h.seq == alt for h in haps), "alt haplotype not assembled"
    assert any(h.seq == ref for h in haps), "ref path must survive pruning"


def test_topological_sort_detects_cycle():
    g = assembly.DeBruijnGraph(k=4)
    # ACGTACGTACGT repeats the 4-mer ACGT → cycle
    g.add_sequence("ACGTACGTACGT", is_ref=True)
    assert g.topological_order() is None
    assert g.k_best_paths() == []


def test_full_pipeline_calls_snv():
    rng = np.random.default_rng(1)
    ref = "".join(rng.choice(list("ACGT"), assembly.ACTIVE_REGION))
    pos = 47
    alt_base = "G" if ref[pos] != "G" else "T"
    alt = ref[:pos] + alt_base + ref[pos + 1 :]
    reads = _reads_from(alt, 80, 40, rng)
    haps, variants = assembly.local_assembly(ref, reads)
    assert haps[0].seq == alt, "PairHMM must rank the alt haplotype first"
    assert any(
        v.kind == "snv" and v.pos == pos and v.alt == alt_base
        for v in variants
    ), variants


def test_full_pipeline_calls_deletion():
    rng = np.random.default_rng(2)
    ref = "".join(rng.choice(list("ACGT"), assembly.ACTIVE_REGION))
    alt = ref[:40] + ref[43:]          # 3bp deletion
    reads = _reads_from(alt, 80, 40, rng)
    haps, variants = assembly.local_assembly(ref, reads)
    assert haps[0].seq == alt
    assert any(v.kind == "del" and len(v.ref) == 3 for v in variants), variants


def test_clean_reads_call_no_variants():
    rng = np.random.default_rng(3)
    ref = "".join(rng.choice(list("ACGT"), assembly.ACTIVE_REGION))
    reads = _reads_from(ref, 60, 40, rng)
    haps, variants = assembly.local_assembly(ref, reads)
    assert haps[0].seq == ref
    assert variants == []
