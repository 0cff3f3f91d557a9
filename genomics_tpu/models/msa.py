"""Center-star MSA (reference: CDP/STAR — CMSA2).

Pipeline: k-mer occurrence center selection (center-star.cc:12-100) →
pairwise NW of every sequence against the center (affine, 3-matrix,
no x↔y switching, MATCH=0 / MISMATCH=-1 / GAP_START=0 / GAP_EXTEND=-1,
MIN_SCORE boundaries — nw.cc:25-94) → run-length backtrack producing
per-position gap counts `space` (gaps into the center) and
`spaceForOther` (gaps into the sequence) (nw.cc:96-150) → space merge
and aligned FASTA output (main.cu:90-140).

TPU mapping: the reference runs one CUDA thread per pairwise DP with a
CPU co-run split (SURVEY.md §2.5).  Here ALL pairwise DPs run in one
batched device dispatch (rows scanned, x-chain as a prefix scan — the
GAP_START<=0 decomposition), a device-side batched backtrack returns
only the gap-count arrays, and the
(serial, tiny) backtracks run on the host exactly like the reference's
own CPU gold path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from genomics_tpu.utils.fasta import read_fasta

MATCH, MISMATCH = 0, -1
GAP_START, GAP_EXTEND = 0, -1
MIN_SCORE = -32700
NEG = -(1 << 28)


# ---------------------------------------------------------------------------
# center selection (center-star.cc)
# ---------------------------------------------------------------------------


def _chars_to_index(chunk: str) -> int:
    """charsToIndex (center-star.cc:12-33): 8 chars → 16-bit index;
    -1 on any unrecognized char."""
    bits = 0
    for i, c in enumerate(chunk):
        if c == "A":
            pass
        elif c == "C":
            bits |= 1 << (i * 2 + 1)
        elif c in "TU":
            bits |= 1 << (i * 2)
        elif c == "G":
            bits |= (1 << (i * 2)) | (1 << (i * 2 + 1))
        else:
            return -1
    return bits


_C2I_LUT = np.full(256, -1, np.int64)   # per-char 2-bit contribution
_C2I_LUT[ord("A")] = 0
_C2I_LUT[ord("C")] = 2                  # bit (i*2+1)
_C2I_LUT[ord("T")] = 1                  # bit (i*2)
_C2I_LUT[ord("U")] = 1
_C2I_LUT[ord("G")] = 3


def _chunk_indices(s: str) -> np.ndarray:
    """All 8-char chunk indices of one sequence, vectorized (-1 where
    any char is unrecognized) — same values as _chars_to_index."""
    n8 = len(s) // 8
    if n8 == 0:
        return np.zeros(0, np.int64)
    b = np.frombuffer(s.encode()[: n8 * 8], np.uint8).reshape(n8, 8)
    v = _C2I_LUT[b]
    bad = (v < 0).any(axis=1)
    idx = (v << (2 * np.arange(8, dtype=np.int64))[None, :]).sum(axis=1)
    return np.where(bad, -1, idx)


def find_center_sequence(seqs: list[str]) -> int:
    """findCenterSequence (center-star.cc:38-100), vectorized: the
    occurrence vector counts each chunk once per sequence; the center
    maximizes the sum of occurrence counts over its chunks."""
    chunk_lists = [_chunk_indices(s) for s in seqs]
    vec = np.zeros(65536, np.int64)
    for ch in chunk_lists:
        u = np.unique(ch[ch >= 0])
        vec[u] += 1
    max_idx, max_count = 0, 0
    for i, ch in enumerate(chunk_lists):
        valid = ch[ch >= 0]
        count = int(vec[valid].sum())
        if count > max_count:
            max_idx, max_count = i, count
    return max_idx


# ---------------------------------------------------------------------------
# batched pairwise NW (nw.cc semantics) → M matrices
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=())
def nw_matrices_batch(
    center: jnp.ndarray, seqs: jnp.ndarray, sub_table: jnp.ndarray | None = None
) -> jnp.ndarray:
    """center: [m] uint8 bytes; seqs: [B, n_pad] uint8 (0 = pad).
    sub_table: optional [256, 256] int32 char-indexed scores (protein
    matrices via core.submat; default MATCH/MISMATCH DNA scoring).
    Returns M: [B, m+1, n_pad+1] int32 (nw.cc matrix), computed for the
    padded width — callers slice to each sequence's own n+1."""
    m = center.shape[0]
    B, n = seqs.shape
    jidx = jnp.arange(n + 1, dtype=jnp.int32)
    GSE = GAP_START + GAP_EXTEND

    row0 = jnp.where(jidx == 0, 0, MIN_SCORE)
    row0 = jnp.broadcast_to(row0, (B, n + 1)).astype(jnp.int32)
    y0 = jnp.full((B, n + 1), MIN_SCORE, jnp.int32)

    def body(carry, ci):
        Mprev, Yprev, i = carry
        if sub_table is None:
            sub = jnp.where(seqs == ci, MATCH, MISMATCH).astype(jnp.int32)
        else:
            sub = sub_table[ci.astype(jnp.int32)][seqs.astype(jnp.int32)]
        dia = Mprev[:, :-1] + sub                                        # j=1..n
        y = jnp.maximum(GSE + Mprev[:, 1:], GAP_EXTEND + Yprev[:, 1:])
        # x-chain: x[j] = max(GSE + M[i][j-1], GE + x[i][j-1]) with
        # M[i][j-1] = max(dia, x, y)[j-1]; GSE <= GE lets the x-term of
        # M absorb: x[j] = max(g[j-1], x[j-1] + GE), g = GSE + max(dia, y)
        g = GSE + jnp.maximum(dia, y)                                    # [B, n]
        # prefix scan with v[j] = x[j] - j*GE: v[j] = max(v[j-1], g[j-1]
        # - j*GE), v[0] = x-boundary = MIN_SCORE (its decay is the
        # constant MIN_SCORE floor in v-space).  Array slot ai holds
        # cell j = ai+1, so v_arr = max(cummax(g - (ai+1)*GE), MIN_SCORE)
        # contribution of G[cell c'] to v[cell j] (j > c') is
        # G[c'] - (c'+1)*GE, so the cummax is exclusive (shifted)
        c = g - (jidx[1:] + 1) * GAP_EXTEND
        cm = jax.lax.cummax(c, axis=1)
        v = jnp.maximum(
            jnp.concatenate([jnp.full((B, 1), NEG, jnp.int32), cm[:, :-1]], axis=1),
            MIN_SCORE,
        )
        x = v + jidx[1:] * GAP_EXTEND
        Mrow = jnp.maximum(jnp.maximum(dia, x), y)
        Mfull = jnp.concatenate(
            [jnp.full((B, 1), MIN_SCORE, jnp.int32), Mrow], axis=1
        )
        Yfull = jnp.concatenate(
            [jnp.full((B, 1), GAP_START + (i + 1) * GAP_EXTEND, jnp.int32), y],
            axis=1,
        )
        return (Mfull, Yfull, i + 1), Mfull

    (Mlast, Ylast, _), Ms = jax.lax.scan(body, (row0, y0, jnp.int32(0)), center)
    return jnp.concatenate([row0[:, None, :], Ms.transpose(1, 0, 2)], axis=1)


@functools.partial(jax.jit, static_argnames=("has_sub",))
def backtrack_batch(Ms, cenc, seqs, slens, sub_table=None, has_sub=False):
    """Device-side batched backtrack (the reference runs this on-device
    too: cuda_backtrack_3d, CDP/STAR/cuda-nw.cu:219-249).  Walks each
    pair's M matrix with nw.cc:96-150's diag-preferred, k-run
    gap-matching order inside a vmapped while_loop and returns ONLY the
    gap-count arrays (space [B, m+1], so [B, n_pad+1]) — the O(B·m·n)
    matrices never leave the device (r2 shipped them to host)."""
    B, m1, n1 = Ms.shape
    m = m1 - 1
    KMAX = max(m1, n1)
    ks = jnp.arange(1, KMAX + 1, dtype=jnp.int32)
    BIG = jnp.int32(1 << 30)
    # column reads come from a transposed copy so BOTH per-step walk
    # gathers are contiguous rows (a strided column gather was ~20% of
    # the walk time, measured r5).  The copy doubles live HBM for the
    # cube, so fall back to strided column gathers for very large
    # batches (> 1 Gi cells ≈ 4 GB) rather than trading a 20% speedup
    # for an OOM cliff.
    use_T = Ms.size <= (1 << 30)
    MsT = jnp.swapaxes(Ms, 1, 2) if use_T else Ms

    def one(M, MT, seq, n):
        def cond(st):
            i, j, _, _ = st
            return (i != 0) | (j != 0)

        def body(st):
            i, j, space, so = st
            ci = cenc[jnp.maximum(i - 1, 0)].astype(jnp.int32)
            sj = seq[jnp.maximum(j - 1, 0)].astype(jnp.int32)
            if has_sub:
                s = sub_table[ci, sj]
            else:
                s = jnp.where(ci == sj, MATCH, MISMATCH).astype(jnp.int32)
            row = jax.lax.dynamic_index_in_dim(M, i, 0, keepdims=False)
            if use_T:
                col = jax.lax.dynamic_index_in_dim(MT, j, 0,
                                                   keepdims=False)
            else:
                col = jax.lax.dynamic_index_in_dim(MT, j, 1,
                                                   keepdims=False)
            Mij = row[j]
            diag = (i > 0) & (j > 0) & (s + M[jnp.maximum(i - 1, 0),
                                              jnp.maximum(j - 1, 0)] == Mij)
            run = GAP_START + GAP_EXTEND * ks
            vert = (ks <= i) & (col[jnp.maximum(i - ks, 0)] + run == Mij)
            kv = jnp.min(jnp.where(vert, ks, BIG))
            horiz = (ks <= j) & (row[jnp.maximum(j - ks, 0)] + run == Mij)
            kh = jnp.min(jnp.where(horiz, ks, BIG))
            use_v = ~diag & (kv <= kh)
            use_h = ~diag & (kv > kh)
            so = so.at[j].add(jnp.where(use_v, kv, 0))
            space = space.at[i].add(jnp.where(use_h, kh, 0))
            i2 = jnp.where(diag, i - 1, jnp.where(use_v, i - kv, i))
            j2 = jnp.where(diag, j - 1, jnp.where(use_h, j - kh, j))
            return (i2, j2, space, so)

        init = (jnp.int32(m), n.astype(jnp.int32),
                jnp.zeros(m1, jnp.int32), jnp.zeros(n1, jnp.int32))
        _, _, space, so = jax.lax.while_loop(cond, body, init)
        return space, so

    return jax.vmap(one)(Ms, MsT, seqs, jnp.asarray(slens, jnp.int32))


def backtrack(M: np.ndarray, center: str, seq: str, sub_table=None):
    """nw.cc:96-150: diag-preferred walk with k-run gap matching.
    Returns (space [m+1], space_for_other [n+1]) gap counts."""
    m, n = len(center), len(seq)
    space = np.zeros(m + 1, np.int64)
    so = np.zeros(n + 1, np.int64)
    i, j = m, n
    while i != 0 or j != 0:
        if sub_table is not None and i > 0 and j > 0:
            s = int(sub_table[ord(center[i - 1]), ord(seq[j - 1])])
        else:
            s = MATCH if (i > 0 and j > 0 and center[i - 1] == seq[j - 1]) else MISMATCH
        if i > 0 and j > 0 and s + M[i - 1][j - 1] == M[i][j]:
            i -= 1
            j -= 1
        else:
            k = 1
            while True:
                if i >= k and M[i][j] == M[i - k][j] + GAP_START + GAP_EXTEND * k:
                    so[j] += k
                    i -= k
                    break
                elif j >= k and M[i][j] == M[i][j - k] + GAP_START + GAP_EXTEND * k:
                    space[i] += k
                    j -= k
                    break
                else:
                    k += 1
    return space, so


# ---------------------------------------------------------------------------
# driver + output merge (main.cu)
# ---------------------------------------------------------------------------


def msa(seqs: list[str], center_idx: int | None = None,
        matrix_path: str | None = None, mesh=None):
    """Center-star MSA.  Returns (aligned list[str] in input order,
    center_idx).  matrix_path: optional NCBI scoring matrix (the STAR
    `-p scoring/BLOSUM62.txt` protein mode).

    mesh: optional jax Mesh — the per-sequence NW batch is sharded over
    its `data` axis (the multi_gpu_msa analog, reference:
    CDP/STAR/cuda-nw.cu:358-431, which splits the workload across
    cudaSetDevice loops; here XLA partitions the one jitted batch)."""
    sub_table = None
    if matrix_path:
        from genomics_tpu.core.submat import load_scoring_matrix

        sub_table = load_scoring_matrix(matrix_path)
    if center_idx is None:
        center_idx = find_center_sequence(seqs)
    center = seqs[center_idx]
    others = [s for k, s in enumerate(seqs) if k != center_idx]
    m = len(center)
    max_len = max(len(s) for s in seqs)

    n_pad = max((len(s) for s in others), default=1)
    n_rows = len(others)
    pad_b = 0 if mesh is None else (-n_rows) % mesh.devices.size
    arr = np.zeros((n_rows + pad_b, n_pad), np.uint8)
    for k, s in enumerate(others):
        arr[k, : len(s)] = np.frombuffer(s.encode(), np.uint8)
    cenc = np.frombuffer(center.encode(), np.uint8)
    arr_d = jnp.asarray(arr)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        arr_d = jax.device_put(arr_d, NamedSharding(mesh, P("data")))
    sub_d = None if sub_table is None else jnp.asarray(sub_table)
    Ms_d = nw_matrices_batch(jnp.asarray(cenc), arr_d, sub_d)
    # device-side backtrack: only the [B, m+1] / [B, n+1] gap counts
    # come back to host, never the O(B·m·n) matrices
    slens = np.array([len(s) for s in others] + [1] * pad_b, np.int32)
    sp_d, so_d = backtrack_batch(
        Ms_d, jnp.asarray(cenc), arr_d, jnp.asarray(slens),
        sub_table=sub_d, has_sub=sub_table is not None,
    )
    space = np.asarray(sp_d, np.int64)[:n_rows]
    so_pad = np.asarray(so_d, np.int64)[:n_rows]
    so = np.zeros((len(others), max_len + 1), np.int64)
    so[:, : so_pad.shape[1]] = so_pad[:, : max_len + 1]

    # output merge (main.cu:90-140)
    space_center = space.max(axis=0) if len(others) else np.zeros(m + 1, np.int64)
    aligned_center = center
    for pos in range(m, -1, -1):
        if space_center[pos] > 0:
            aligned_center = (
                aligned_center[:pos] + "-" * int(space_center[pos]) + aligned_center[pos:]
            )
    any_center_gaps = bool(space_center.any())
    out = []
    for k, s in enumerate(others):
        a = s
        # fast paths: substitution-only alignments (the common case)
        # have no gap insertions at all — skip the per-position scans
        if so[k].any():
            for pos in range(len(s), -1, -1):
                if so[k, pos] > 0:
                    a = a[:pos] + "-" * int(so[k, pos]) + a[pos:]
        if any_center_gaps:
            shift = 0
            for pos in range(m + 1):
                num = int(space_center[pos] - space[k, pos])
                if num > 0:
                    a = a[: pos + shift] + "-" * num + a[pos + shift :]
                shift += int(space_center[pos])
        out.append(a)
    out.insert(center_idx, aligned_center)
    return out, center_idx


def run_file(input_path: str, output_path: str | None = None, mesh=None):
    recs = read_fasta(input_path)
    aligned, center_idx = msa([r.seq for r in recs], mesh=mesh)
    if output_path:
        with open(output_path, "w") as fh:
            for r, a in zip(recs, aligned):
                fh.write(f">{r.name}\n")
                for i in range(0, len(a), 60):
                    fh.write(a[i : i + 60] + "\n")
    return aligned, center_idx
