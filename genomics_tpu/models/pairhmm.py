"""PairHMM likelihood engine (reference: Non-CDP/PairHMM, CDP/PairHMM).

The reference ships nine CUDA variants of the same forward algorithm
(warp wavefront, improved warp, shared-memory tiles x2, inter-task
tiles x5 — SURVEY.md §2.4) that differ only in parallel scheme.  On TPU
they collapse into one batched engine: the Pallas anti-diagonal kernel
(compiled, on TPU) or the scan engine (elsewhere), both preserving the
reference's per-cell f32 op order (bit-exact vs __fmaf_rn on TPU).

Dataset format and GCUPS metric match the reference driver
(warp_based.cu:222-272, 447)."""
from __future__ import annotations

import dataclasses
import time

import jax
import numpy as np

from genomics_tpu.core import golds


@dataclasses.dataclass
class PairHMMResult:
    likelihoods: np.ndarray
    gcups: float
    cells: int
    seconds: float


def _pad_records(records, lane_multiple: int):
    B = len(records)
    Bp = ((B + lane_multiple - 1) // lane_multiple) * lane_multiple
    R = max(len(r["read"]) for r in records)
    C = max(len(r["hap"]) for r in records)
    reads = np.zeros((Bp, R), np.uint8)
    haps = np.zeros((Bp, C), np.uint8)
    rlen = np.ones(Bp, np.int32)
    clen = np.ones(Bp, np.int32)
    bq = np.zeros((Bp, R), np.int32)
    iq = np.zeros((Bp, R), np.int32)
    dq = np.zeros((Bp, R), np.int32)
    for i, r in enumerate(records):
        rd = r["read"].encode() if isinstance(r["read"], str) else r["read"]
        hp = r["hap"].encode() if isinstance(r["hap"], str) else r["hap"]
        reads[i, : len(rd)] = np.frombuffer(rd, np.uint8)
        haps[i, : len(hp)] = np.frombuffer(hp, np.uint8)
        rlen[i], clen[i] = len(rd), len(hp)
        bq[i, : len(rd)] = r["base_quals"]
        iq[i, : len(rd)] = r["ins_quals"]
        dq[i, : len(rd)] = r["del_quals"]
    return reads, haps, rlen, clen, bq, iq, dq, B


def compute_likelihoods(records, replicate_to: int | None = None,
                        exact: bool = False) -> PairHMMResult:
    """Forward likelihoods for (read, hap) records.

    replicate_to: like the reference's fakesize batch replication
    (warp_based.cu:276-293) — tile the records up to this batch size
    for throughput measurement.
    exact: on TPU, compute the reference's __fmaf_rn sites with
    single-rounded emulated FMAs (bit parity with the CUDA math,
    ~4x slower); default is the fast two-rounded VPU form."""
    if replicate_to and replicate_to > len(records):
        reps = (replicate_to + len(records) - 1) // len(records)
        records = (records * reps)[:replicate_to]

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        from genomics_tpu.ops import pallas_pairhmm as eng
        import jax.numpy as jnp

        # both modes run the inter-task strip kernel (thread-per-pair
        # analog); exact mode emulates the reference's single-rounded
        # __fmaf_rn at the same three sites as the anti-diagonal exact
        # kernel (which remains the cross-checked parity reference)
        packed = _pad_records(records, eng.INTER_TILE)
        reads, haps, rlen, clen, bq, iq, dq, B = packed
        R, C = reads.shape[1], haps.shape[1]
        # ALL prep on host (numpy): XLA's TPU reciprocal-based f32
        # divide gives a 1-ulp-off D0 for ~23% of lengths, and the
        # ph2pr table gathers lower catastrophically slowly — host prep
        # is both the bit-parity and the fast path
        p = eng.prepare_params_np(bq, iq, dq)
        d0 = (golds.INITIAL_CONSTANT / clen.astype(np.float32)).astype(
            np.float32)
        t0 = time.perf_counter()
        out = eng.pairhmm_forward_intertask_prepared(
            jnp.asarray(reads.T, jnp.int32),
            jnp.asarray(haps.T, jnp.int32),
            jnp.asarray(rlen, jnp.int32)[None, :],
            jnp.asarray(clen, jnp.int32)[None, :],
            jnp.asarray(d0)[None, :],
            jnp.asarray(p["Qm_1"].T), jnp.asarray(p["Qm"].T),
            jnp.asarray(p["delta"].T), jnp.asarray(p["xiksi"].T),
            jnp.asarray(np.pad(p["alpha"].T, ((0, 1), (0, 0)))),
            exact=exact,
        )
    else:
        from genomics_tpu.ops import scan_pairhmm as eng

        packed = _pad_records(records, 8)
        reads, haps, rlen, clen, bq, iq, dq, B = packed
        t0 = time.perf_counter()
        out = eng.pairhmm_forward_batch(reads, haps, rlen, clen, bq, iq, dq)
    out = np.asarray(out)[:B]
    dt = time.perf_counter() - t0
    cells = int((rlen[:B].astype(np.int64) * clen[:B]).sum())
    return PairHMMResult(
        likelihoods=out, gcups=cells / dt / 1e9, cells=cells, seconds=dt
    )


def compute_region_likelihoods(regions, exact: bool = False):
    """GATK HaplotypeCaller-shaped REGION batches: each region carries
    R reads and H candidate haplotypes and needs the full R x H
    likelihood matrix (the reference's real_data drivers pack exactly
    this cross product per region — the NUM_ADD {read_haplotype_number;
    address_array} blob of Non-CDP/PairHMM/.../warp_based.cu:14-18,
    341-408).  All regions' cross products flatten into ONE inter-task
    batch (the TPU analog of the packed blob), one kernel dispatch.

    regions: list of {"reads": [{read, base_quals, ins_quals,
    del_quals}], "haps": [str|bytes]}.
    Returns (list of [R, H] f32 matrices, PairHMMResult over the flat
    batch)."""
    flat = []
    shapes = []
    for reg in regions:
        rds, haps = reg["reads"], reg["haps"]
        shapes.append((len(rds), len(haps)))
        for r in rds:
            for h in haps:
                flat.append({
                    "read": r["read"],
                    "base_quals": r["base_quals"],
                    "ins_quals": r["ins_quals"],
                    "del_quals": r["del_quals"],
                    "hap": h,
                })
    res = compute_likelihoods(flat, exact=exact)
    out = []
    k = 0
    for (R, H) in shapes:
        out.append(res.likelihoods[k:k + R * H].reshape(R, H))
        k += R * H
    return out, res


def run_dataset(path: str, fakesize: int | None = None,
                exact: bool = False) -> PairHMMResult:
    """The reference driver flow: parse dataset, (optionally) replicate
    to fakesize, compute, report GCUPS (warp_based.cu:196-447)."""
    records = golds.read_pairhmm_dataset(path)
    return compute_likelihoods(records, replicate_to=fakesize, exact=exact)


def verify_against_gold(path: str, limit: int = 8):
    """Parity check vs the CPU gold on a bundled dataset → max rel err."""
    records = golds.read_pairhmm_dataset(path, limit=limit)
    res = compute_likelihoods(records)
    rels = []
    for r, got in zip(records, res.likelihoods):
        want = golds.pairhmm_forward(
            r["read"], r["hap"], r["base_quals"], r["ins_quals"], r["del_quals"]
        )
        rels.append(abs(float(got) - float(want)) / max(float(want), 1e-30))
    return max(rels), res
