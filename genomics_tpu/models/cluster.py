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
import functools
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
    dense_dev: object = None   # lazily-built [N, 4^wl] device word counts
    dense_k: int = 0           # max word multiplicity (matmul term count)
    aux_dev: dict = None       # device-resident prefix/cutoff/LCS arrays


def _prepare(seqs: list[str], threshold: float, word_length: int) -> _Prepped:
    N = len(seqs)
    lengths = np.array([len(s) for s in seqs], np.int64)
    # sort by length desc (stable for determinism; reference std::sort)
    order = np.argsort(-lengths, kind="stable")
    seqs = [seqs[i] for i in order]
    lengths = lengths[order]

    # one padded matrix (pad code 4 = gap/N → windows touching padding
    # are invalid automatically), everything below fully vectorized —
    # the per-read loops were ~1/3 of total time at 50k reads
    Lmax_all = max(int(lengths.max()), word_length) if N else word_length
    A = np.full((N, Lmax_all), 4, np.uint8)
    flat = _BASE_MAP[np.frombuffer("".join(seqs).encode(), np.uint8)]
    rowidx = np.repeat(np.arange(N), lengths)
    starts = np.concatenate([[0], np.cumsum(lengths[:-1])])
    colidx0 = np.arange(len(flat)) - np.repeat(starts, lengths)
    A[rowidx, colidx0] = flat
    prefix = np.stack([(A == b).sum(axis=1) for b in range(4)],
                      axis=1).astype(np.int64)

    # words (gap-free k-mers), distinct + counts — vectorized
    # sort + run-length over all rows at once.  Reference packs
    # base[i-j] << 2j (func.cu:258-263): the window's LAST base gets
    # shift 0 → window index x shifts by 2*(wl-1-x).
    wl = word_length
    SENT = np.uint32(1 << (2 * wl))
    # rolling-key build per column (no [N, W, wl] strided materialize —
    # ~3x cheaper on this host's memory bandwidth): key ending at col j
    # = ((key << 2) | base) masked; valid iff the non-gap run length
    # ending at j is >= wl
    nw = Lmax_all - wl + 1
    keys = np.full((N, nw), SENT, np.uint32)
    key = np.zeros(N, np.uint32)
    run = np.zeros(N, np.int32)
    kmask = SENT - 1
    for j in range(Lmax_all):
        col = A[:, j]
        isb = col != 4
        key = ((key << 2) | col) & kmask
        run = np.where(isb, run + 1, 0)
        if j >= wl - 1:
            keys[:, j - wl + 1] = np.where(run >= wl, key, SENT)
    srt = np.sort(keys, axis=1)
    valid = srt != SENT
    newm = np.ones_like(valid)
    newm[:, 1:] = srt[:, 1:] != srt[:, :-1]
    newm &= valid
    n_dist = newm.sum(axis=1)
    wmax = max(int(n_dist.max()) if N else 0, 1)
    ordpos = np.cumsum(newm, axis=1) - 1
    rows, cols = np.nonzero(newm)
    words = np.zeros((N, wmax), np.uint16)
    word_counts = np.zeros((N, wmax), np.uint16)
    words[rows, ordpos[rows, cols]] = srt[rows, cols].astype(np.uint16)
    # run lengths: global run ids over the flattened sorted matrix
    run_id = np.cumsum(newm.ravel()) - 1
    rl = np.bincount(run_id[valid.ravel()], minlength=max(len(rows), 1))
    word_counts[rows, ordpos[rows, cols]] = np.minimum(
        rl[: len(rows)], 0xFFFF).astype(np.uint16)

    # cutoffs (kernel_createCutoff, func.cu exact float semantics) —
    # vectorized with the same f32/f64 promotion the scalar loop had:
    # f32(L) * pyfloat promotes to f64 before the ceil; the word-cutoff
    # product stays f32 x f32
    thr32 = np.float32(threshold)
    Lf32 = lengths.astype(np.float32)
    cutoff_v = np.ceil(
        Lf32.astype(np.float64) * (1.0 - float(thr32))
    ).astype(np.int64) * wl
    required_v = np.maximum(lengths - wl + 1 - cutoff_v, 1)
    if float(thr32) >= 0.9:
        offset = np.float32(1.1) - abs(np.float32(thr32) - np.float32(0.95)) * 2
    else:
        offset = np.float32(1.0)
    word_cutoff = np.ceil(
        required_v.astype(np.float32) * np.float32(offset)
    ).astype(np.int64)
    base_cutoff = np.ceil(
        (Lf32 * thr32).astype(np.float64)
    ).astype(np.int64)

    # de-gap + 2-bit pack (little-endian bit order, func.cu:422-457) —
    # vectorized: a stable argsort of the gap mask compacts non-gap
    # bases to the front of each row, order preserved
    gap = A == 4
    net = (~gap).sum(axis=1).astype(np.int64)
    W32 = int(net.max()) // 32 + 1
    Lmax = int(net.max())
    order2 = np.argsort(gap, axis=1, kind="stable")
    compact = np.take_along_axis(A, order2, axis=1)
    colidx = np.arange(Lmax_all)[None, :]
    codes_full = np.where(colidx < net[:, None], compact, 255).astype(np.uint8)
    codes = np.full((N, Lmax), 255, np.uint8)
    codes[:, : min(Lmax, Lmax_all)] = codes_full[:, :Lmax]
    padded = np.zeros((N, W32 * 32), np.uint8)
    m = min(W32 * 32, Lmax_all)
    padded[:, :m] = np.where(colidx < net[:, None], compact, 0)[:, :m]
    pb = padded.reshape(N, W32, 32).astype(np.uint32)
    shifts32 = np.arange(32, dtype=np.uint32)
    low = ((pb & 1) << shifts32).sum(axis=2, dtype=np.uint64).astype(np.uint32)
    high = (((pb >> 1) & 1) << shifts32).sum(
        axis=2, dtype=np.uint64).astype(np.uint32)
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


@functools.partial(jax.jit, static_argnames=("K",))
def _word_min_sum(Dreps, Djobs, K: int):
    """Device word filter: got[s, j] = sum_bins min(D[s], D[j]) via K
    indicator MATMULS on the MXU — min(a, b) over small non-negative
    counts decomposes as sum_{k=1..K} [a>=k]*[b>=k], so the min-sum is
    sum_k <A_k, B_k> with A_k/B_k 0/1 matrices.  EXACT: 0/1 is exact in
    bf16 and the MXU accumulates in f32 (sums <= 4^wl < 2^24).

    This replaces the host [S, J, W] gather+min+sum intermediate
    (hundreds of MB per round — the r4 throughput bound, VERDICT weak
    #7) with S*J*4^wl*K MAC flops the MXU does for free."""
    got = None
    for k in range(1, K + 1):
        A = (Dreps >= k).astype(jnp.bfloat16)
        B = (Djobs >= k).astype(jnp.bfloat16)
        g = jax.lax.dot_general(
            A, B, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        got = g if got is None else got + g
    return got.astype(jnp.int32)


def _pack_bits_cols(a_u8):
    """[S, J] 0/1 uint8 → [S, J//8] little-endian packed bytes (J % 8
    == 0).  The dev-tunnel D2H link measures ~10 MB/s, so shipping an
    accept MATRIX uncompressed (16 MB at S=256, J=64k) costs seconds
    per greedy round; bits are 8x less, and np.unpackbits restores."""
    S, J = a_u8.shape
    sh = jnp.arange(8, dtype=jnp.uint32)
    return (a_u8.reshape(S, J // 8, 8).astype(jnp.uint32)
            << sh).sum(axis=-1).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("K",))
def _filters_dev(D, prefix, wcut, bcut, rp, jp, K: int):
    """Prefix filter (kernel_preFilter) + word filter (kernel_filter)
    fused ON DEVICE, including the index gathers — ONE dispatch per
    round (each separate jitted call costs a ~25 ms tunnel RPC).
    Returns (pass2 [S, J] uint8 — left device-resident for the LCS
    stage to AND against — and the bit-packed any-column vector the
    host uses to pick LCS batches; ~J/8 bytes D2H)."""
    pre = jnp.minimum(jnp.take(prefix, rp, axis=0)[:, None, :],
                      jnp.take(prefix, jp, axis=0)[None, :, :]).sum(-1)
    p1 = pre >= jnp.take(bcut, jp)[None, :]
    got = _word_min_sum(jnp.take(D, rp, axis=0),
                        jnp.take(D, jp, axis=0), K)
    p2 = (p1 & (got >= jnp.take(wcut, jp)[None, :])).astype(jnp.uint8)
    any_bits = _pack_bits_cols(jnp.max(p2, axis=0)[None, :])
    return p2, any_bits


@jax.jit
def _lcs_accept_bits(low, high, net, codes, bcut, rp, jb,
                     p2_dev, cb_idx):
    """Batched LCS (kernel_dynamic, func.cu:609-720) + cutoff compare,
    ANDed with the device-resident pass2 columns, bit-packed for D2H;
    gathers fused for one dispatch per batch."""
    matched = _lcs_multi(
        jnp.take(low, rp, axis=0), jnp.take(high, rp, axis=0),
        jnp.take(net, rp), jnp.take(codes, jb, axis=0),
        jnp.take(net, jb))
    acc = (matched > jnp.take(bcut, jb)[None, :]) & \
        (jnp.take(p2_dev, cb_idx, axis=1) != 0)
    return _pack_bits_cols(acc.astype(jnp.uint8))


_DENSE_MAX_BINS = 1 << 14   # wl <= 7; beyond that the dense matrix
#                             and matmul flops outgrow the host gather
_DENSE_MAX_K = 8            # rare ultra-repetitive data: host fallback


def _dense_counts(p: _Prepped, wl: int):
    """Build (once) the device-resident dense word-count matrix."""
    if p.dense_dev is not None:
        return p.dense_dev, p.dense_k
    bins = 1 << (2 * wl)
    K = int(p.word_counts.max()) if p.word_counts.size else 0
    if bins > _DENSE_MAX_BINS or K > _DENSE_MAX_K or K == 0:
        p.dense_k = -1
        return None, -1
    N = len(p.words)
    D = np.zeros((N, bins), np.uint8)
    rows = np.repeat(np.arange(N), p.words.shape[1])
    # padding slots carry count 0; maximum.at keeps a real word-0 count
    np.maximum.at(D, (rows, p.words.ravel()),
                  np.minimum(p.word_counts, 255).astype(np.uint8).ravel())
    p.dense_dev = jnp.asarray(D)
    p.dense_k = K
    return p.dense_dev, K


def _aux_dev(p: _Prepped) -> dict:
    """Ship the per-read filter/LCS arrays to the device ONCE — the
    greedy loop then only uploads index vectors per round."""
    if p.aux_dev is None:
        p.aux_dev = {
            "prefix": jnp.asarray(p.prefix, jnp.int32),
            "wcut": jnp.asarray(p.word_cutoff, jnp.int32),
            "bcut": jnp.asarray(p.base_cutoff, jnp.int32),
            "low": jnp.asarray(p.low),
            "high": jnp.asarray(p.high),
            "net": jnp.asarray(p.net_lengths, jnp.int32),
            "codes": jnp.asarray(p.codes),
        }
    return p.aux_dev


def _pow2_pad(idx: np.ndarray, cap: int, floor: int = 256) -> np.ndarray:
    """Pad an index vector to a power-of-two bucket (<= cap) by
    repeating its first entry — jit shape churn was making the greedy
    loops COMPILE-bound (every distinct job count was a fresh kernel
    build); bucketing bounds the shape count at log2(cap).  Above the
    cap, pad to a 2048-multiple instead: shapes stay bounded AND a
    multiple of 8 (the bit-packing contract — an unpadded over-cap
    vector crashed _pack_bits_cols at e.g. 70002 jobs)."""
    n = len(idx)
    if n > cap:
        tgt = ((n + 2047) // 2048) * 2048
    else:
        tgt = min(max(floor, 1 << (n - 1).bit_length()), cap)
    if tgt <= n:
        return idx
    return np.concatenate([idx, np.full(tgt - n, idx[0], idx.dtype)])


def _accept_matrix(p: _Prepped, reps: np.ndarray, jobs: np.ndarray, wl: int,
                   batch_cap: int, s_pad: int | None = None) -> np.ndarray:
    """[S, J] bool: does candidate rep s accept job j (filters + LCS).

    Device-first (VERDICT r4 task #3): the prefix + word filters run as
    one fused device call (_filters_dev — the word min-sum as MXU
    matmuls), pass2 stays device-resident, the LCS stage ANDs it on
    device, and only bit-packed vectors cross the host link.  The host
    gather path below is the exact fallback/oracle for data the dense
    matrix can't represent (wl > 7 or word multiplicity > 8)."""
    S, J = len(reps), len(jobs)
    acc = np.zeros((S, J), bool)
    reps_p = reps
    if s_pad and s_pad > S:
        reps_p = np.concatenate([reps, np.full(s_pad - S, reps[0])])
    D_dev, K = _dense_counts(p, wl)
    if D_dev is None:
        return _accept_matrix_host(p, reps, jobs, wl, batch_cap, reps_p)
    aux = _aux_dev(p)
    jobs_p = _pow2_pad(jobs, max(batch_cap * 4, 1 << 16))
    rp = jnp.asarray(reps_p)
    jp = jnp.asarray(jobs_p)
    p2_dev, any_bits = _filters_dev(
        D_dev, aux["prefix"], aux["wcut"], aux["bcut"], rp, jp, K)
    anyv = np.unpackbits(np.asarray(any_bits), axis=1,
                         bitorder="little")[0, :J]
    cols = np.nonzero(anyv)[0]
    pend = []
    for s0 in range(0, len(cols), batch_cap):
        cb = cols[s0 : s0 + batch_cap]
        cb_p = _pow2_pad(cb, batch_cap)       # positions into jobs(_p)
        jb = jobs_p[cb_p]
        bits = _lcs_accept_bits(
            aux["low"], aux["high"], aux["net"], aux["codes"],
            aux["bcut"], rp, jnp.asarray(jb), p2_dev, jnp.asarray(cb_p))
        pend.append((cb, bits))
    for cb, bits in pend:                     # collect after dispatch
        lacc = np.unpackbits(np.asarray(bits), axis=1,
                             bitorder="little")[:S, : len(cb)]
        acc[:, cb] = lacc != 0
    return acc


def _accept_matrix_host(p: _Prepped, reps, jobs, wl, batch_cap, reps_p):
    """Host filters + device LCS — the original path, kept as the
    exact oracle (tests) and the fallback for wl > 7 / multiplicity > 8."""
    S, J = len(reps), len(jobs)
    acc = np.zeros((S, J), bool)
    pre = np.minimum(p.prefix[reps][:, None, :],
                     p.prefix[jobs][None, :, :]).sum(axis=2)
    pass1 = pre >= p.base_cutoff[jobs][None, :]
    tables = np.zeros((S, 1 << (2 * wl)), np.uint32)
    for si, r in enumerate(reps):
        m = p.word_counts[r] > 0
        tables[si, p.words[r][m]] = p.word_counts[r][m]
    got = np.minimum(
        tables[:, p.words[jobs]], p.word_counts[jobs][None, :, :]
    ).sum(axis=2)
    pass2 = pass1 & (got >= p.word_cutoff[jobs][None, :])
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
        )[:S, : len(cb)]
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
