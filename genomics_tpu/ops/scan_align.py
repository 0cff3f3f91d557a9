"""Batched affine-gap DP engines as JAX scans (portable compute path).

TPU-first reformulation of the GASAL2 kernels (reference:
CDP/GASAL2/src/kernels/*.h): instead of one CUDA thread per alignment
walking 8x8 register tiles, we vectorize the whole recurrence across the
batch and sweep the target axis with `lax.scan`, carrying the H/E column
state (the `short2 global[MAX_QUERY_LEN]` analog) as dense [B, Lq]
arrays.  The horizontal gap chain — sequential in the CUDA kernel — is
resolved with a max-plus prefix scan (cummax), which is exact for:

- local/global cores: gap opens read tmp = diag + sub (the reference's
  "cleanup" cores, local_kernel_template.h:19-30), so f is directly a
  running max of (tmp - gap_oe) terms;
- semiglobal/banded h-based cores: h = max(tmp, f, e[, 0]) lets
  f's h-term be decomposed into tmp/e terms (valid since gap_oe >=
  gap_extend), again yielding a running max.

End positions replicate the reference's strip visit order (strips of 8
target rows, query-major inside a strip, strict '<' updates): the winner
is the min-visit-key cell among max-scoring cells, with
key(i, j) = ((i >> 3) * Lq + j) * 8 + (i & 7).  Carried per row as a
lexicographic (score desc, key asc) reduction.

Padding: sequences are padded with the N code to the static bucket
shape.  Cells beyond a pair's own 8-padded extent score sub=0 and can
only tie (never beat) visited cells, and their visit keys are larger, so
no masking is needed for score/end parity with the gold (verified in
tests/test_scan_align.py).

All scores int32; MINUS_INF = -32768 (SHRT_MIN) as in gasal_kernels.h.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from genomics_tpu.core.encoding import N4
from genomics_tpu.core.scoring import AlignmentParams, SemiGlobalSkip

MINUS_INF = -32768
NEG_BIG = jnp.int32(-(1 << 28))  # safe -inf for scans (no underflow)


class AlignResult(NamedTuple):
    score: jnp.ndarray        # [B] int32
    query_end: jnp.ndarray    # [B] int32
    target_end: jnp.ndarray   # [B] int32
    tb: jnp.ndarray | None = None  # [B, Lt, Lq] uint8 nibbles (bit3=f_ext,
    #                                 bit2=e_ext, bits1:0=dir), or None


def _sub_scores(qrow, tbase, params: AlignmentParams, global_macro: bool):
    """Substitution scores for one target base against all query columns.

    qrow: [B, Lq] uint8, tbase: [B] uint8 → [B, Lq] int32.
    Replicates DEV_GET_SUB_SCORE_LOCAL / _GLOBAL (gasal_kernels.h:39-57).
    """
    eq = qrow == tbase[:, None]
    s = jnp.where(eq, jnp.int32(params.match), jnp.int32(-params.mismatch))
    is_n = (qrow == N4) | (tbase[:, None] == N4)
    if params.n_penalty is not None:
        s = jnp.where(is_n, jnp.int32(-params.n_penalty), s)
    elif not global_macro:
        s = jnp.where(is_n, jnp.int32(0), s)
    return s


def _shift_right(x, fill):
    """[B, L] → [B, L] shifted one along axis 1; column 0 = fill ([B] or scalar)."""
    fill = jnp.asarray(fill, x.dtype)
    if fill.ndim == 1:
        fill = fill[:, None]
    fill = jnp.broadcast_to(fill, x.shape[:1] + (1,))
    return jnp.concatenate([fill, x[:, :-1]], axis=1)


def _fscan(g, seed, ge):
    """Horizontal gap prefix scan.

    f_used[0] = seed; f_used[j] = max(g[j-1], f_used[j-1] - ge).
    Computed via w[j] = f_used[j] + j*ge = max(seed, cummax(g + (k+1)*ge)[j-1]).
    g, seed: [B, L] / [B] int32 → [B, L] int32.
    """
    B, L = g.shape
    jidx = jnp.arange(L, dtype=jnp.int32)[None, :]
    c = g + (jidx + 1) * ge
    cm = jax.lax.cummax(c, axis=1)
    w = jnp.maximum(seed[:, None], _shift_right(cm, NEG_BIG))
    return w - jidx * ge


def _row_key(i, Lq, j_idx):
    """GASAL2 strip visit-order key for row i (scalar) over columns."""
    return ((jnp.int32(i) >> 3) * Lq + j_idx) * 8 + (jnp.int32(i) & 7)


def _better(rh, rkey, bh, bkey):
    """Lexicographic (score desc, key asc) merge."""
    take = (rh > bh) | ((rh == bh) & (rkey < bkey))
    return take


def _tb_nibble(sub, tmp, h, f_used, e_used, goe, ge, local_floor: bool):
    """4-bit traceback code per cell (CORE_*_COMPUTE_TB semantics)."""
    m_or_x = jnp.where(sub >= 0, jnp.uint8(0), jnp.uint8(1))
    d = jnp.where(
        h == tmp,
        m_or_x,
        jnp.where(h == f_used, jnp.uint8(3), jnp.uint8(2)),
    )
    f_ext = jnp.where((tmp - goe) > (f_used - ge), jnp.uint8(0), jnp.uint8(1))
    e_ext = jnp.where((tmp - goe) > (e_used - ge), jnp.uint8(0), jnp.uint8(1))
    return d | (e_ext << 2) | (f_ext << 3)


# ---------------------------------------------------------------------------
# LOCAL (gasal_local_kernel)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("params", "with_tb"))
def local_align_batch(
    q: jnp.ndarray,       # [B, Lq] uint8 codes, N4-padded, Lq % 8 == 0
    t: jnp.ndarray,       # [B, Lt] uint8 codes, N4-padded, Lt % 8 == 0
    params: AlignmentParams,
    with_tb: bool = False,
) -> AlignResult:
    """Batched GASAL2 local alignment (score + end positions [+ traceback]).

    Row-sweep formulation of local_kernel_template.h:72-519 — see module
    docstring.  E(0,j) = 0 and f(i,-1) = 0 (the gE/f strip inits), floor
    at 0, tmp-based gap opens."""
    B, Lq = q.shape
    Lt = t.shape[1]
    goe = jnp.int32(params.gap_oe)
    ge = jnp.int32(params.gap_extend)
    j_idx = jnp.arange(Lq, dtype=jnp.int32)[None, :]

    def row(carry, ti):
        H_prev, E, best, bkey = carry
        i, tbase = ti
        sub = _sub_scores(q, tbase, params, global_macro=False)
        tmp = _shift_right(H_prev, jnp.int32(0)) + sub
        f_used = _fscan(tmp - goe, jnp.zeros((B,), jnp.int32), ge)
        h = jnp.maximum(jnp.maximum(tmp, f_used), jnp.maximum(E, 0))
        E_new = jnp.maximum(tmp - goe, E - ge)
        # leftmost max in the row == min key in the row
        row_j = jnp.argmax(h, axis=1).astype(jnp.int32)
        rh = jnp.max(h, axis=1)
        rkey = ((i >> 3) * jnp.int32(Lq) + row_j) * 8 + (i & 7)
        take = _better(rh, rkey, best, bkey)
        best = jnp.where(take, rh, best)
        bkey = jnp.where(take, rkey, bkey)
        nib = (
            _tb_nibble(sub, tmp, h, f_used, E, goe, ge, True)
            if with_tb
            else jnp.zeros((0,), jnp.uint8)
        )
        return (h, E_new, best, bkey), nib

    init = (
        jnp.zeros((B, Lq), jnp.int32),
        jnp.zeros((B, Lq), jnp.int32),
        jnp.zeros((B,), jnp.int32),
        jnp.full((B,), jnp.iinfo(jnp.int32).max, jnp.int32),
    )
    (H, E, best, bkey), nibs = jax.lax.scan(
        row, init, (jnp.arange(Lt, dtype=jnp.int32), t.T)
    )
    # decode key → (i, j): key = ((i>>3)*Lq + j)*8 + (i&7)
    cell = bkey >> 3
    qend = cell % Lq
    tend = (cell // Lq) * 8 + (bkey & 7)
    zero = best == 0
    qend = jnp.where(zero, 0, qend)
    tend = jnp.where(zero, 0, tend)
    tb = jnp.transpose(nibs, (1, 0, 2)) if with_tb else None
    return AlignResult(best, qend, tend, tb)


# ---------------------------------------------------------------------------
# GLOBAL (gasal_global_kernel)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("params", "with_tb"))
def global_align_batch(
    q: jnp.ndarray,
    t: jnp.ndarray,
    qlen: jnp.ndarray,    # [B] int32 true lengths
    tlen: jnp.ndarray,    # [B] int32
    params: AlignmentParams,
    with_tb: bool = False,
) -> AlignResult:
    """Batched GASAL2 global alignment (global.h:31-303).

    Boundaries (replicated exactly):
      H(-1, j) = 0 if j == 0 else -(gapo + ge*j)      (global[] init)
      H(i, -1) = -(gapo + ge*(i+1))                   (col boundary, u ctr)
      diag(i, 0) = 0 if i == 0 else -(gapo + ge*i)    (p[] init, r ctr)
      E(0, j) = MINUS_INF; f(i, -1) = MINUS_INF
    Score = H(tlen-1, qlen-1), read where the sweep hits the true
    lengths (per-pair, via masked capture)."""
    B, Lq = q.shape
    Lt = t.shape[1]
    goe = jnp.int32(params.gap_oe)
    ge = jnp.int32(params.gap_extend)
    gapo = jnp.int32(params.gap_open)
    j_idx = jnp.arange(Lq, dtype=jnp.int32)[None, :]

    H0 = jnp.where(j_idx == 0, 0, -(gapo + ge * j_idx))
    H0 = jnp.broadcast_to(H0, (B, Lq)).astype(jnp.int32)

    def row(carry, ti):
        H_prev, E, score = carry
        i, tbase = ti
        sub = _sub_scores(q, tbase, params, global_macro=True)
        diag0 = jnp.where(i == 0, jnp.int32(0), -(gapo + ge * i))
        tmp = _shift_right(H_prev, diag0) + sub
        f_used = _fscan(tmp - goe, jnp.full((B,), MINUS_INF, jnp.int32), ge)
        h = jnp.maximum(jnp.maximum(tmp, f_used), E)
        E_new = jnp.maximum(tmp - goe, E - ge)
        # capture H(i, qlen-1) when i == tlen-1
        last_col = jnp.take_along_axis(h, (qlen - 1)[:, None], axis=1)[:, 0]
        score = jnp.where(i == tlen - 1, last_col, score)
        nib = (
            _tb_nibble(sub, tmp, h, f_used, E, goe, ge, False)
            if with_tb
            else jnp.zeros((0,), jnp.uint8)
        )
        return (h, E_new, score), nib

    init = (
        H0,
        jnp.full((B, Lq), MINUS_INF, jnp.int32),
        jnp.zeros((B,), jnp.int32),
    )
    (H, E, score), nibs = jax.lax.scan(
        row, init, (jnp.arange(Lt, dtype=jnp.int32), t.T)
    )
    tb = jnp.transpose(nibs, (1, 0, 2)) if with_tb else None
    return AlignResult(score, qlen - 1, tlen - 1, tb)


# ---------------------------------------------------------------------------
# SEMI-GLOBAL (gasal_semi_global_kernel)
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("params", "head", "tail", "with_tb")
)
def semiglobal_align_batch(
    q: jnp.ndarray,
    t: jnp.ndarray,
    qlen: jnp.ndarray,
    tlen: jnp.ndarray,
    params: AlignmentParams,
    head: SemiGlobalSkip = SemiGlobalSkip.NONE,
    tail: SemiGlobalSkip = SemiGlobalSkip.NONE,
    with_tb: bool = False,
) -> AlignResult:
    """Batched GASAL2 semiglobal (semiglobal_kernel_template.h:40-230).

    h-based Gotoh core: f's h-term decomposed as
    f(i,j) = max(max(tmp, e)(i,j-1) - goe, f(i,j-1) - ge).
    HEAD picks boundary inits; TAIL picks where the max is scanned:
    TARGET → last query column across target rows (masked to ridx+1 ==
    read_len and row < ref_len), QUERY → bottom row across query
    columns, with the rightmost-column fixup."""
    B, Lq = q.shape
    Lt = t.shape[1]
    goe = jnp.int32(params.gap_oe)
    ge = jnp.int32(params.gap_extend)
    gapo = jnp.int32(params.gap_open)
    j_idx = jnp.arange(Lq, dtype=jnp.int32)[None, :]
    head_q = head in (SemiGlobalSkip.QUERY, SemiGlobalSkip.BOTH)
    head_t = head in (SemiGlobalSkip.TARGET, SemiGlobalSkip.BOTH)
    tail_q = tail in (SemiGlobalSkip.QUERY, SemiGlobalSkip.BOTH)
    tail_t = tail in (SemiGlobalSkip.TARGET, SemiGlobalSkip.BOTH)

    if head_q:
        H0 = jnp.zeros((B, Lq), jnp.int32)
        E0 = jnp.zeros((B, Lq), jnp.int32)
    else:
        H0 = jnp.broadcast_to(
            jnp.where(j_idx == 0, 0, -(gapo + ge * j_idx)), (B, Lq)
        ).astype(jnp.int32)
        E0 = jnp.full((B, Lq), MINUS_INF, jnp.int32)

    # each pair's own 8-padded target extent: the row the reference's
    # final global[] scan sees (its strips stop at ceil(tlen/8))
    t_last8 = ((jnp.asarray(tlen, jnp.int32) + 7) // 8) * 8 - 1

    def row(carry, ti):
        H_prev, E, bT_score, bT_pos, Hsnap = carry
        i, tbase = ti
        sub = _sub_scores(q, tbase, params, global_macro=False)
        if head_t:
            diag0 = jnp.int32(0)
            left0 = jnp.int32(0)         # H(i, -1) = 0 (h[m] strip init)
        else:
            # col boundary quirk (:125): h[m] = -(gapo + ge*(u-1)) → row i
            # boundary = -(gapo + ge*i); diag = 0 for i==0 else -(gapo+ge*i)
            diag0 = jnp.where(i == 0, jnp.int32(0), -(gapo + ge * i))
            left0 = -(gapo + ge * i)
        tmp = _shift_right(H_prev, diag0) + sub
        # e used at (i, j) = max(H(i-1, j) - goe, e(i-1, j) - ge)
        E_used = jnp.maximum(H_prev - goe, E - ge)
        # f: h-based, with the strip-init h[m] entering at column 0:
        # f_used(i, 0) = max(left0 - goe, MINUS_INF - ge)
        g = jnp.maximum(tmp, E_used) - goe
        fseed = jnp.maximum(left0 - goe, jnp.int32(MINUS_INF) - ge)
        fseed = jnp.broadcast_to(fseed, (B,)).astype(jnp.int32)
        f_used = _fscan(g, fseed, ge)
        h = jnp.maximum(jnp.maximum(tmp, f_used), E_used)
        # TAIL TARGET: scan the last query column (ridx+1 == read_len),
        # rows gidx+m-1 < ref_len; strict '>' keeps the first (min-i) max.
        lastq = jnp.take_along_axis(h, (qlen - 1)[:, None], axis=1)[:, 0]
        valid = i < tlen
        upd = tail_t & valid & (lastq > bT_score)
        bT_score = jnp.where(upd, lastq, bT_score)
        bT_pos = jnp.where(upd, i, bT_pos)
        Hsnap = jnp.where((i == t_last8)[:, None], h, Hsnap)
        nib = (
            _tb_nibble(sub, tmp, h, f_used, E_used, goe, ge, False)
            if with_tb
            else jnp.zeros((0,), jnp.uint8)
        )
        return (h, E_used, bT_score, bT_pos, Hsnap), nib

    init = (
        H0,
        E0,
        jnp.full((B,), MINUS_INF, jnp.int32),
        jnp.asarray(tlen, jnp.int32),
        jnp.zeros((B, Lq), jnp.int32),
    )
    (H, E, bT_score, bT_pos, Hsnap), nibs = jax.lax.scan(
        row, init, (jnp.arange(Lt, dtype=jnp.int32), t.T)
    )

    # reference init quirk: maxXY_x = ref_len, maxXY_y = read_len (:63-64)
    score = jnp.full((B,), MINUS_INF, jnp.int32)
    qend = jnp.asarray(tlen, jnp.int32)   # maxXY_x ← ref_len
    tend = jnp.asarray(qlen, jnp.int32)   # maxXY_y ← read_len
    if tail_t:
        score = bT_score
        tend = jnp.where(bT_score > MINUS_INF, bT_pos, tend)
    tb = jnp.transpose(nibs, (1, 0, 2)) if with_tb else None

    if tail_q:
        # the reference scans global[] after its own strips: H at row
        # ceil(tlen/8)*8 - 1 (the Hsnap capture).  Mask m < read_len.
        mask = j_idx < jnp.asarray(qlen, jnp.int32)[:, None]
        Hrow = jnp.where(mask, Hsnap, NEG_BIG)
        better = Hrow > score[:, None]
        any_better = jnp.any(better, axis=1)
        # first m attaining the running max in left-to-right strict-'>'
        # order == leftmost position of the row max among cells > score
        cand = jnp.where(better, Hrow, NEG_BIG)
        m_best = jnp.argmax(cand, axis=1)
        new_score = jnp.max(cand, axis=1)
        qend = jnp.where(any_better, m_best.astype(jnp.int32), qend)
        score = jnp.where(any_better, new_score, score)
        # rightmost-column fixup (:205-210)
        tend = jnp.where(qend != jnp.asarray(tlen, jnp.int32), jnp.asarray(qlen, jnp.int32), tend)

    return AlignResult(score, qend, tend, tb)


# ---------------------------------------------------------------------------
# KSW seed-extend (gasal_ksw_kernel)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("params",))
def ksw_align_batch(
    q: jnp.ndarray,       # [B, Lq]
    t: jnp.ndarray,       # [B, Lt]
    qlen: jnp.ndarray,
    tlen: jnp.ndarray,
    h0: jnp.ndarray,      # [B] int32 seed scores
    params: AlignmentParams,
) -> AlignResult:
    """Batched bwa-mem ksw_extend (ksw_kernel_template.h:46-203).

    The reference's data-dependent control flow is carried as per-pair
    state: the beg/end active window (masked updates emulate the skipped
    cells exactly — skipped prefixes hold eh = (0,0) so a full-row
    compute with masked writes is equivalent), the m == 0 early break
    (alive flag), and the gscore-vs-clip final choice.  zdrop is
    hardcoded 0 in the reference (disabled)."""
    B, Lq = q.shape
    Lt = t.shape[1]
    goe = jnp.int32(params.gap_oe)
    ge = jnp.int32(params.gap_extend)
    Lqe = Lq + 1  # eh[] has a live slot at index `end` <= qlen
    j_idx = jnp.arange(Lqe, dtype=jnp.int32)[None, :]
    qe = jnp.pad(q, ((0, 0), (0, 1)), constant_values=N4)

    # first row: eh[0].h = h0; eh[1].h = max(h0-goe, 0);
    # eh[j].h = eh[j-1].h - ge while > ge (ksw_kernel_template.h:79-83)
    h0b = jnp.asarray(h0, jnp.int32)
    ehh0 = jnp.maximum(h0b[:, None] - goe - (j_idx - 1) * ge, 0)
    ehh0 = jnp.where(j_idx == 0, h0b[:, None], ehh0)
    # the decay loop stops once a value <= ge is written: values after the
    # first j with eh[j].h <= ge are 0 ... except the stopping value itself
    # is written.  eh[j] (j>=2) is written iff eh[j-1] > ge, i.e. iff
    # h0 - goe - (j-2)*ge > ge.  eh[1] always written.
    written = jnp.where(
        j_idx >= 2, (h0b[:, None] - goe - (j_idx - 2) * ge) > ge, j_idx >= 0
    )
    ehh0 = jnp.where(written, ehh0, 0)
    ehh0 = jnp.where(j_idx <= jnp.asarray(qlen, jnp.int32)[:, None], ehh0, 0)
    ehe0 = jnp.zeros((B, Lqe), jnp.int32)

    def row(carry, i):
        ehh, ehe, beg, end, alive, mx, max_i, max_j, max_ie, gscore = carry
        tbase = t[:, i]
        do = alive & (i < jnp.asarray(tlen, jnp.int32))
        sub = _sub_scores(qe, tbase, params, global_macro=False)
        M = jnp.where(ehh != 0, ehh + sub, 0)
        tterm = jnp.maximum(M - goe, 0)
        # f chain: f(beg) = 0; f(j) = max(f(j-1) - ge, tterm(j-1)); skipped
        # prefix cells have M = 0 → tterm = 0, so a full scan seeded 0 is
        # exact (see docstring).
        f_used = _fscan(tterm, jnp.zeros((B,), jnp.int32), ge)
        h = jnp.maximum(jnp.maximum(M, ehe), f_used)
        # boundary column: h1 entering cell beg
        h1_0 = jnp.where(
            beg == 0,
            jnp.maximum(h0b - (goe + ge * i), 0),
            0,
        )
        inwin = (j_idx >= beg[:, None]) & (j_idx < end[:, None])
        hwin = jnp.where(inwin, h, NEG_BIG)
        rowmax = jnp.maximum(jnp.max(hwin, axis=1), 0)
        # mj: LAST index attaining the row max (ties update, :147-148)
        mj = jnp.max(jnp.where(hwin == rowmax[:, None], j_idx, -1), axis=1)
        # eh writes: ehh[j] = H(i, j-1) for j in window; ehh[end] = h1 final
        Hleft = jnp.concatenate([h1_0[:, None], h[:, :-1]], axis=1)
        # H(i, j-1): for j == beg it's the boundary h1_0, else h(j-1)
        Hleft = jnp.where(j_idx == beg[:, None], h1_0[:, None], Hleft)
        ehe_new = jnp.maximum(ehe - ge, tterm)
        at_end = j_idx == end[:, None]
        h1_final = jnp.where(
            end > beg,
            jnp.take_along_axis(h, jnp.maximum(end - 1, 0)[:, None], axis=1)[:, 0],
            h1_0,
        )
        ehh_out = jnp.where(inwin, Hleft, ehh)
        ehh_out = jnp.where(at_end, h1_final[:, None], ehh_out)
        ehe_out = jnp.where(inwin, ehe_new, ehe)
        ehe_out = jnp.where(at_end, 0, ehe_out)
        ehh = jnp.where(do[:, None], ehh_out, ehh)
        ehe = jnp.where(do[:, None], ehe_out, ehe)
        # gscore (only when the row reached the last query column)
        reach = do & (end == jnp.asarray(qlen, jnp.int32))
        gupd = reach & (gscore <= h1_final)
        gscore = jnp.where(gupd, h1_final, gscore)
        max_ie = jnp.where(gupd, i, max_ie)
        # m == 0 break (after eh/gscore, before max/window updates)
        died = do & (rowmax == 0)
        alive = alive & ~died
        do2 = do & ~died
        mupd = do2 & (rowmax > mx)
        mx = jnp.where(mupd, rowmax, mx)
        max_i = jnp.where(mupd, i, max_i)
        max_j = jnp.where(mupd, mj, max_j)
        # window update on the NEW eh arrays
        act = (ehh != 0) | (ehe != 0)
        scan_range = (j_idx >= beg[:, None]) & (j_idx < end[:, None])
        first_act = jnp.min(
            jnp.where(scan_range & act, j_idx, jnp.int32(1 << 28)), axis=1
        )
        beg_new = jnp.minimum(first_act, end)
        scan_range2 = (j_idx >= beg_new[:, None]) & (j_idx <= end[:, None])
        last_act = jnp.max(jnp.where(scan_range2 & act, j_idx, -(1 << 28)), axis=1)
        last_act = jnp.maximum(last_act, beg_new - 1)
        end_new = jnp.minimum(last_act + 2, jnp.asarray(qlen, jnp.int32))
        beg = jnp.where(do2, beg_new, beg)
        end = jnp.where(do2, end_new, end)
        return (ehh, ehe, beg, end, alive, mx, max_i, max_j, max_ie, gscore), None

    init = (
        ehh0,
        ehe0,
        jnp.zeros((B,), jnp.int32),
        jnp.asarray(qlen, jnp.int32),
        jnp.ones((B,), bool),
        h0b,
        jnp.full((B,), -1, jnp.int32),
        jnp.full((B,), -1, jnp.int32),
        jnp.full((B,), -1, jnp.int32),
        jnp.full((B,), -1, jnp.int32),
    )
    (ehh, ehe, beg, end, alive, mx, max_i, max_j, max_ie, gscore), _ = jax.lax.scan(
        row, init, jnp.arange(Lt, dtype=jnp.int32)
    )
    clip = (gscore <= 0) | (gscore <= mx - 5)  # PEN_CLIP5
    score = jnp.where(clip, mx, gscore)
    qend = jnp.where(clip, max_j + 1, jnp.asarray(qlen, jnp.int32))
    tend = jnp.where(clip, max_i + 1, max_ie + 1)
    return AlignResult(score, qend, tend, None)


# ---------------------------------------------------------------------------
# BANDED (gasal_banded_tiled_kernel)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("params", "band_width_tiles"))
def banded_align_batch(
    q: jnp.ndarray,
    t: jnp.ndarray,
    qlen: jnp.ndarray,
    tlen: jnp.ndarray,
    params: AlignmentParams,
    band_width_tiles: int,
) -> AlignResult:
    """Batched banded local DP (banded.h:10-140): tile-diagonal band,
    h-based core, stale out-of-band state preserved (masked writes), the
    per-strip chain resets at the band's left edge (diag = 0), and the
    strip visit-order max tracking restricted to band cells."""
    B, Lq = q.shape
    Lt = t.shape[1]
    goe = jnp.int32(params.gap_oe)
    ge = jnp.int32(params.gap_extend)
    j_idx = jnp.arange(Lq, dtype=jnp.int32)[None, :]
    qr = (jnp.asarray(qlen, jnp.int32) + 7) // 8
    tr = (jnp.asarray(tlen, jnp.int32) + 7) // 8
    k_band = jnp.int32(band_width_tiles)
    k_other = tr - (qr - k_band)

    def row(carry, i):
        gH, gE, best, bkey = carry
        strip = i >> 3
        tbase = t[:, i]
        visit_row = strip < tr
        j0 = jnp.maximum(0, strip - k_other + 1) * 8          # [B]
        jend = jnp.minimum(k_band + strip, qr) * 8            # [B]
        inband = (j_idx >= j0[:, None]) & (j_idx < jend[:, None]) & visit_row[:, None]
        sub = _sub_scores(q, tbase, params, global_macro=False)
        # diag: 0 at the band's first column (strip p[] reset), else H(i-1,j-1)
        tmp = _shift_right(gH, jnp.int32(0)) + sub
        tmp = jnp.where(j_idx == j0[:, None], sub, tmp)
        # e: h-based vertical from previous row's H (gH) and carried gE
        E_used = jnp.maximum(gH - goe, gE - ge)
        # at the strip's first row the carry state IS gH/gE (stale-safe);
        # rows 1-7 of a strip also read gH which by then holds the
        # previous row's in-band H (masked writes) — same thing.
        # f: h-based horizontal; seed at band left edge:
        # f(i, j0) = max(h_init(0) - goe, f_init(0) - ge) = -ge
        g = jnp.maximum(jnp.maximum(tmp, E_used), 0) - goe
        g = jnp.where(inband, g, NEG_BIG)
        # seed so the scan yields f(j0) = max(-goe, -ge) = -ge (the strip
        # h/f = 0 inits feeding the first in-band column)
        g = jnp.where(j_idx == (j0 - 1)[:, None], -ge, g)
        f_used = _fscan(g, jnp.full((B,), -int(params.gap_extend), jnp.int32), ge)
        h = jnp.maximum(jnp.maximum(tmp, f_used), jnp.maximum(E_used, 0))
        # masked writes
        gH_new = jnp.where(inband, h, gH)
        gE_new = jnp.where(inband, E_used, gE)
        hmask = jnp.where(inband, h, NEG_BIG)
        row_j = jnp.argmax(hmask, axis=1).astype(jnp.int32)
        rh = jnp.max(hmask, axis=1)
        rkey = ((i >> 3) * jnp.int32(Lq) + row_j) * 8 + (i & 7)
        take = (rh > best) | ((rh == best) & (rkey < bkey))
        take = take & (rh > 0)
        best = jnp.where(take, rh, best)
        bkey = jnp.where(take, rkey, bkey)
        return (gH_new, gE_new, best, bkey), None

    init = (
        jnp.zeros((B, Lq), jnp.int32),
        jnp.zeros((B, Lq), jnp.int32),
        jnp.zeros((B,), jnp.int32),
        jnp.full((B,), jnp.iinfo(jnp.int32).max, jnp.int32),
    )
    (gH, gE, best, bkey), _ = jax.lax.scan(
        row, init, jnp.arange(Lt, dtype=jnp.int32)
    )
    cell = bkey >> 3
    qend = jnp.where(best > 0, cell % Lq, 0)
    tend = jnp.where(best > 0, (cell // Lq) * 8 + (bkey & 7), 0)
    return AlignResult(best, qend, tend, None)
