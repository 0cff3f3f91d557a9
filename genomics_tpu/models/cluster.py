"""Greedy read clustering (reference: CDP/CLUSTER — CD-HIT-style).

Pipeline parity with Non-CDP/CLUSTER/func.cu: read FASTA → sort by
length desc → base-to-number → prefix base counts → k-mer short words
(sorted, merged) → cutoffs → de-gap → 2-bit pack → greedy clustering
(representative = first unclustered; 3-stage candidate filtering:
prefix filter, word-histogram filter, bit-parallel LCS accept) → reps.

TPU mapping (SURVEY.md §2.9): the per-candidate bit-parallel LCS
(kernel_dynamic's 32x32 carry-save core, func.cu:609-720) becomes a
batched jnp kernel — query bases scanned sequentially, text words
vectorized, the ripple-carry of the big-integer adds resolved by a
monotone fix-point (exact).  The cheap filters and the inherently
serial greedy loop stay on the host (numpy), as in the reference.

The CDP tree's speculative multi-representative batching
(func.cu:722-820) is exposed as `speculate > 1`: S consecutive
candidates are treated as representatives in one device dispatch and
conflicts resolved by smallest-owner, which preserves the serial
semantics exactly (same final clustering) while batching the DP.
"""
from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from genomics_tpu.utils.fasta import FastaRecord, read_fasta

_BASE_MAP = np.full(256, 4, np.uint8)
for _c, _v in [("A", 0), ("C", 1), ("G", 2), ("T", 3), ("U", 3)]:
    _BASE_MAP[ord(_c)] = _v
    _BASE_MAP[ord(_c.lower())] = _v


def auto_word_length(threshold: float) -> int:
    """func.cu:48-57."""
    if threshold < 0.88:
        return 4
    if threshold < 0.94:
        return 5
    if threshold < 0.97:
        return 6
    return 7


@dataclasses.dataclass
class _Prepped:
    order: np.ndarray          # original indices in sorted order
    lengths: np.ndarray        # original lengths (incl. gaps)
    prefix: np.ndarray         # [N, 4] base counts
    words: np.ndarray          # [N, Wmax] distinct words (sorted, padded)
    word_counts: np.ndarray    # [N, Wmax] counts (0 = pad)
    word_cutoff: np.ndarray
    base_cutoff: np.ndarray
    net_lengths: np.ndarray    # de-gapped lengths
    low: np.ndarray            # [N, W32] packed low bit-planes
    high: np.ndarray           # [N, W32]
    codes: np.ndarray          # [N, Lmax] de-gapped 2-bit codes (pad 255)


def _prepare(seqs: list[str], threshold: float, word_length: int) -> _Prepped:
    N = len(seqs)
    lengths = np.array([len(s) for s in seqs], np.int64)
    # sort by length desc (stable for determinism; reference std::sort)
    order = np.argsort(-lengths, kind="stable")
    seqs = [seqs[i] for i in order]
    lengths = lengths[order]

    nums = [
        _BASE_MAP[np.frombuffer(s.encode(), np.uint8)] for s in seqs
    ]
    prefix = np.zeros((N, 4), np.int64)
    for i, a in enumerate(nums):
        for b in range(4):
            prefix[i, b] = int((a == b).sum())

    # words (gap-free k-mers), distinct + counts
    wl = word_length
    wmax = 1
    dwords, dcounts = [], []
    for a in nums:
        if len(a) < wl:
            dwords.append(np.zeros(0, np.uint16))
            dcounts.append(np.zeros(0, np.uint16))
            continue
        # word at position i (i from wl-1): sum base[i-j] << 2j
        win = np.lib.stride_tricks.sliding_window_view(a, wl)  # [n-wl+1, wl]
        valid = (win != 4).all(axis=1)
        # reference packs base[i-j] << 2j (func.cu:258-263): the window's
        # LAST base gets shift 0 → window index x shifts by 2*(wl-1-x)
        shifts = 2 * np.arange(wl - 1, -1, -1, dtype=np.uint32)
        w = (win.astype(np.uint32) << shifts).sum(axis=1).astype(np.uint16)
        w = w[valid]
        uw, uc = np.unique(w, return_counts=True)
        dwords.append(uw.astype(np.uint16))
        dcounts.append(np.minimum(uc, 0xFFFF).astype(np.uint16))
        wmax = max(wmax, len(uw))
    words = np.zeros((N, wmax), np.uint16)
    word_counts = np.zeros((N, wmax), np.uint16)
    for i, (uw, uc) in enumerate(zip(dwords, dcounts)):
        words[i, : len(uw)] = uw
        word_counts[i, : len(uw)] = uc

    # cutoffs (kernel_createCutoff, func.cu exact float semantics)
    thr32 = np.float32(threshold)
    word_cutoff = np.zeros(N, np.int64)
    base_cutoff = np.zeros(N, np.int64)
    for i, L in enumerate(lengths):
        required = L - wl + 1
        cutoff = math.ceil(np.float32(L) * (1.0 - float(thr32))) * wl
        required -= cutoff
        required = max(required, 1)
        if float(thr32) >= 0.9:
            offset = np.float32(1.1) - abs(np.float32(thr32) - np.float32(0.95)) * 2
        else:
            offset = np.float32(1.0)
        word_cutoff[i] = math.ceil(np.float32(required) * offset)
        base_cutoff[i] = math.ceil(np.float32(L) * thr32)

    # de-gap + 2-bit pack (little-endian bit order, func.cu:422-457)
    net = np.array([int((a != 4).sum()) for a in nums], np.int64)
    W32 = int(net.max()) // 32 + 1
    Lmax = int(net.max())
    low = np.zeros((N, W32), np.uint32)
    high = np.zeros((N, W32), np.uint32)
    codes = np.full((N, Lmax), 255, np.uint8)
    shifts32 = np.arange(32, dtype=np.uint32)
    for i, a in enumerate(nums):
        d = a[a != 4]
        codes[i, : len(d)] = d
        pad = np.zeros(W32 * 32, np.uint8)
        pad[: len(d)] = d
        pb = pad.reshape(W32, 32).astype(np.uint32)
        low[i] = ((pb & 1) << shifts32).sum(axis=1, dtype=np.uint64).astype(np.uint32)
        high[i] = (((pb >> 1) & 1) << shifts32).sum(axis=1, dtype=np.uint64).astype(
            np.uint32
        )
    return _Prepped(
        order=order,
        lengths=lengths,
        prefix=prefix,
        words=words,
        word_counts=word_counts,
        word_cutoff=word_cutoff,
        base_cutoff=base_cutoff,
        net_lengths=net,
        low=low,
        high=high,
        codes=codes,
    )


# ---------------------------------------------------------------------------
# bit-parallel LCS (kernel_dynamic) — batched device kernel
# ---------------------------------------------------------------------------


@jax.jit
def _lcs_batch(
    text_low: jnp.ndarray,   # [W32] uint32 (representative, de-gapped)
    text_high: jnp.ndarray,
    text_len: jnp.ndarray,   # scalar int32 (net length)
    q_codes: jnp.ndarray,    # [B, Lq] uint8 2-bit codes (255 = pad)
    q_len: jnp.ndarray,      # [B] int32 net lengths
) -> jnp.ndarray:
    """Number of matched bases (bit-parallel LCS, func.cu:641-660) of
    each query vs the text → [B] int32.  Exact emulation: per query base
    the big-integer row update ripples carries via a monotone fix-point."""
    B, Lq = q_codes.shape
    W = text_low.shape[0]
    tl = text_low[None, :]
    th = text_high[None, :]

    def step(carry, k):
        row = carry  # [B, W] uint32, starts all-ones
        base = q_codes[:, k]
        active = (base != 255) & (k < q_len)
        ql = jnp.where((base & 1) > 0, jnp.uint32(0xFFFFFFFF), jnp.uint32(0))[:, None]
        qh = jnp.where((base & 2) > 0, jnp.uint32(0xFFFFFFFF), jnp.uint32(0))[:, None]
        match = (~(tl ^ ql)) & (~(th ^ qh))
        x = row & match
        u = row & (~match)

        # big-int add: new_row = ((row + carry_in) + x) | u, carries
        # ripple word-to-word; monotone fix-point (carries only 0→1)
        def cond(s):
            cin, prev = s
            return jnp.any(cin != prev)

        def body(s):
            cin, _ = s
            t5 = row + cin
            c1 = (t5 < row).astype(jnp.uint32)
            t5b = t5 + x
            c2 = (t5b < x).astype(jnp.uint32)
            cout = c1 | c2
            cin_new = jnp.concatenate(
                [jnp.zeros((B, 1), jnp.uint32), cout[:, :-1]], axis=1
            )
            cin_new = jnp.maximum(cin_new, cin)
            return cin_new, cin

        if W == 1:
            # single-word text: there is no word-to-word carry at all —
            # and the degenerate zero-width concatenate inside the
            # fix-point loop SIGSEGVs the TPU compiler (measured r5)
            t5 = (row + x) | u
        else:
            cin0 = jnp.zeros((B, W), jnp.uint32)
            cin, _ = jax.lax.while_loop(
                cond, body, (cin0, jnp.full((B, W), 0xFFFFFFFF, jnp.uint32))
            )
            t5 = (row + cin + x) | u
        row = jnp.where(active[:, None], t5, row)
        return row, None

    row0 = jnp.full((B, W), 0xFFFFFFFF, jnp.uint32)
    row, _ = jax.lax.scan(step, row0, jnp.arange(Lq, dtype=jnp.int32))
    # count zero bits within text_len bits
    widx = jnp.arange(W, dtype=jnp.int32)[None, :]
    bits_in_word = jnp.clip(text_len - widx * 32, 0, 32)
    mask = jnp.where(
        bits_in_word >= 32,
        jnp.uint32(0xFFFFFFFF),
        (jnp.uint32(1) << bits_in_word.astype(jnp.uint32)) - 1,
    )
    zeros = jax.lax.population_count((~row) & mask)
    return jnp.sum(zeros, axis=1).astype(jnp.int32)


# [S, ...] representatives against one query batch → [S, B] match counts
_lcs_multi = jax.jit(
    jax.vmap(_lcs_batch, in_axes=(0, 0, 0, None, None), out_axes=0)
)


@dataclasses.dataclass
class ClusterResult:
    cluster: np.ndarray       # [N] rep index per read (sorted order)
    order: np.ndarray         # sorted order → original indices
    n_clusters: int

    def representative_mask(self):
        return self.cluster == np.arange(len(self.cluster))


def cluster_reads(
    seqs: list[str],
    threshold: float = 0.95,
    word_length: int = 0,
    drop: int | None = None,
    batch_cap: int = 4096,
    speculate: int = 1,
) -> ClusterResult:
    """The full greedy clustering pipeline (func.cu:823-855 semantics).

    speculate > 1 enables the CDP tree's speculative multi-representative
    batching (CDP/CLUSTER/func.cu:722-820): S consecutive unclustered
    candidates are treated as representatives in ONE device dispatch and
    conflicts resolved serially-equivalently (each read takes its
    smallest owner among candidates that themselves survived all smaller
    valid owners) — the final clustering is identical to speculate=1."""
    if speculate > 1:
        return _cluster_reads_speculative(
            seqs, threshold, word_length, batch_cap, speculate
        )
    # NOTE: the reference parses drop/pigeon flags but its clustering loop
    # never consults them (func.cu: only checkOption touches them) —
    # the word filter always runs; we match that.
    del drop
    wl = word_length or auto_word_length(threshold)
    p = _prepare(seqs, threshold, wl)
    N = len(seqs)
    cluster = np.full(N, -1, np.int64)
    rep = -1
    while True:
        rep += 1
        while rep < N and cluster[rep] != -1:
            rep += 1
        if rep >= N:
            break
        cluster[rep] = rep
        jobs = np.nonzero(cluster == -1)[0]
        if len(jobs) == 0:
            continue
        # prefix filter
        sums = np.minimum(p.prefix[rep][None, :], p.prefix[jobs]).sum(axis=1)
        jobs = jobs[sums >= p.base_cutoff[jobs]]
        if len(jobs) == 0:
            continue
        # word-histogram filter: Σ min(rep count, query count); only
        # entries with count > 0 are real (count-0 slots are padding and
        # must not clobber table[0], the all-A k-mer)
        table = np.zeros(1 << (2 * wl), np.uint32)
        m = p.word_counts[rep] > 0
        table[p.words[rep][m]] = p.word_counts[rep][m]
        got = np.minimum(table[p.words[jobs]], p.word_counts[jobs]).sum(axis=1)
        jobs = jobs[got >= p.word_cutoff[jobs]]
        if len(jobs) == 0:
            continue
        # bit-parallel LCS accept (jobs padded to pow2 buckets: repeated
        # shapes, not repeated compiles)
        for s in range(0, len(jobs), batch_cap):
            jb = jobs[s : s + batch_cap]
            jb_p = _pow2_pad(jb, batch_cap)
            matched = np.asarray(
                _lcs_batch(
                    jnp.asarray(p.low[rep]),
                    jnp.asarray(p.high[rep]),
                    jnp.int32(p.net_lengths[rep]),
                    jnp.asarray(p.codes[jb_p]),
                    jnp.asarray(p.net_lengths[jb_p], np.int32),
                )
            )[: len(jb)]
            accept = matched > p.base_cutoff[jb]
            cluster[jb[accept]] = rep
    n = int((cluster == np.arange(N)).sum())
    return ClusterResult(cluster=cluster, order=p.order, n_clusters=n)


def run_file(
    input_file: str,
    output_file: str | None = None,
    threshold: float = 0.95,
    word_length: int = 0,
) -> ClusterResult:
    """File-level driver matching the reference CLI (i/o/t/w flags)."""
    recs = read_fasta(input_file)
    res = cluster_reads(
        [r.seq for r in recs], threshold=threshold, word_length=word_length
    )
    if output_file:
        with open(output_file, "w") as fh:
            for i in np.nonzero(res.representative_mask())[0]:
                orig = recs[res.order[i]]
                fh.write(f">{orig.name}\n{orig.seq}\n")
    return res


def _pow2_pad(idx: np.ndarray, cap: int, floor: int = 256) -> np.ndarray:
    """Pad an index vector to a power-of-two bucket (<= cap) by
    repeating its first entry — jit shape churn was making the greedy
    loops COMPILE-bound (every distinct job count was a fresh kernel
    build); bucketing bounds the shape count at log2(cap)."""
    n = len(idx)
    tgt = min(max(floor, 1 << (n - 1).bit_length()), max(cap, n))
    if tgt <= n:
        return idx
    return np.concatenate([idx, np.full(tgt - n, idx[0], idx.dtype)])


def _accept_matrix(p: _Prepped, reps: np.ndarray, jobs: np.ndarray, wl: int,
                   batch_cap: int, s_pad: int | None = None) -> np.ndarray:
    """[S, J] bool: does candidate rep s accept job j (filters + LCS)."""
    S, J = len(reps), len(jobs)
    acc = np.zeros((S, J), bool)
    # prefix filter [S, J]
    pre = np.minimum(p.prefix[reps][:, None, :], p.prefix[jobs][None, :, :]).sum(
        axis=2
    )
    pass1 = pre >= p.base_cutoff[jobs][None, :]
    # word filter
    tables = np.zeros((S, 1 << (2 * wl)), np.uint32)
    for si, r in enumerate(reps):
        m = p.word_counts[r] > 0
        tables[si, p.words[r][m]] = p.word_counts[r][m]
    got = np.minimum(
        tables[:, p.words[jobs]], p.word_counts[jobs][None, :, :]
    ).sum(axis=2)
    pass2 = pass1 & (got >= p.word_cutoff[jobs][None, :])
    # LCS for surviving columns (any rep interested); reps padded to a
    # CONSTANT row count and jobs to pow2 buckets so kernel shapes
    # repeat across rounds (shape churn = remote recompiles)
    reps_p = reps
    if s_pad and s_pad > S:
        reps_p = np.concatenate([reps, np.full(s_pad - S, reps[0])])
    cols = np.nonzero(pass2.any(axis=0))[0]
    for s0 in range(0, len(cols), batch_cap):
        cb = cols[s0 : s0 + batch_cap]
        jb = jobs[cb]
        jb_p = _pow2_pad(jb, batch_cap)
        matched = np.asarray(
            _lcs_multi(
                jnp.asarray(p.low[reps_p]),
                jnp.asarray(p.high[reps_p]),
                jnp.asarray(p.net_lengths[reps_p], jnp.int32),
                jnp.asarray(p.codes[jb_p]),
                jnp.asarray(p.net_lengths[jb_p], np.int32),
            )
        )[:S, : len(cb)]                  # [S, len(cb)]
        acc[:, cb] = pass2[:, cb] & (matched > p.base_cutoff[jb][None, :])
    return acc


def _cluster_reads_speculative(seqs, threshold, word_length, batch_cap, S):
    wl = word_length or auto_word_length(threshold)
    p = _prepare(seqs, threshold, wl)
    N = len(seqs)
    cluster = np.full(N, -1, np.int64)
    pos = 0
    while pos < N:
        # S consecutive unclustered candidates from pos
        cands = []
        k = pos
        while k < N and len(cands) < S:
            if cluster[k] == -1:
                cands.append(k)
            k += 1
        if not cands:
            break
        cands = np.array(cands)
        jobs = np.nonzero(cluster == -1)[0]
        jobs = jobs[jobs > cands[0]]
        if len(jobs):
            A = _accept_matrix(p, cands, jobs, wl, batch_cap, s_pad=S)
        else:
            A = np.zeros((len(cands), 0), bool)
        # serial-equivalent resolution: candidates in order; a candidate
        # is a valid rep iff no earlier valid rep accepted it
        owner = np.full(len(jobs), -1, np.int64)
        job_index = {int(j): idx for idx, j in enumerate(jobs)}
        for si, c in enumerate(cands):
            if cluster[c] != -1:
                continue  # claimed by an earlier valid candidate
            cluster[c] = c
            # claim only still-unclustered jobs (an earlier candidate in
            # this window may have become a rep itself — never overwrite)
            take = (owner == -1) & A[si] & (cluster[jobs] == -1)
            owner[take] = c
            for idx in np.nonzero(take)[0]:
                cluster[jobs[idx]] = c
        pos = int(cands[-1]) + 1
    n = int((cluster == np.arange(N)).sum())
    return ClusterResult(cluster=cluster, order=p.order, n_clusters=n)
