"""Full-featured local alignment: second-best tracking and the
WITH_START reverse pass, with exact GASAL2 cell-visit-order semantics.

These features need CELL-level visit-order state (the reference updates
running maxima per cell inside 8-row strips, column-major), so this
engine scans the target in strips of 8 rows and flattens each strip to
the visit order [B, Lq*8] where the needed running quantities become
cummax prefix scans:

- second best (local_kernel_template.h second-best blocks): a cell is a
  second-best candidate iff h < runmax_inclusive(cell); the final
  second = max over candidates, its positions = first candidate (in
  visit order) attaining it; the query-end quirk (prev_maxHH_second
  compared against maxHH at column granularity, :414-419) is replicated
  via per-column-segment reductions.
- WITH_START (:441-511): the reverse DP runs on the word-aligned
  reversed sequences (plain reversal of the first ceil(end/8)*8 bases);
  the early exit at column-segment granularity is emulated by keyed
  selection: with R = cell-level running max, k* = first key with
  R >= fwd_score, Kend = k*'s segment end, the recorded cell is the
  first attainment of max(h | key <= Kend).  The reference's skewed
  target-start coordinate (gidx + (m-1) against backward word reads) is
  reproduced from (strip, row) exactly.

Slower than ops/scan_align.py (extra reshapes) — used when
second_best / compute_start are requested.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from genomics_tpu.core.encoding import N4
from genomics_tpu.core.scoring import AlignmentParams
from genomics_tpu.ops.scan_align import (
    NEG_BIG,
    _fscan,
    _shift_right,
    _sub_scores,
)

INT_MAX = jnp.iinfo(jnp.int32).max


def _strip_core(q, H, E, tstrip, params, goe, ge, B, Lq):
    """Run 8 rows of the local DP; returns (H, E, h_rows [8, B, Lq])."""
    hs = []
    for r in range(8):
        sub = _sub_scores(q, tstrip[:, r], params, global_macro=False)
        tmp = _shift_right(H, jnp.int32(0)) + sub
        f_used = _fscan(tmp - goe, jnp.zeros((B,), jnp.int32), ge)
        h = jnp.maximum(jnp.maximum(tmp, f_used), jnp.maximum(E, 0))
        E = jnp.maximum(tmp - goe, E - ge)
        H = h
        hs.append(h)
    return H, E, jnp.stack(hs)          # [8, B, Lq]


@functools.partial(jax.jit, static_argnames=("params",))
def local_align_second_batch(q, t, qlen, tlen, params: AlignmentParams):
    """Local alignment with second-best (GASAL2 TRUE semantics).

    The reference visits each pair's OWN 8-padded extent — its padding
    cells can carry flagged (second-best candidate) values — so cells
    beyond qr8/tr8 per pair are masked out while cells inside are kept.

    Returns (score, qend, tend, score2, qend2, tend2), all [B] int32."""
    B, Lq = q.shape
    Lt = t.shape[1]
    assert Lt % 8 == 0
    goe = jnp.int32(params.gap_oe)
    ge = jnp.int32(params.gap_extend)
    nstrips = Lt // 8
    cell_idx = jnp.arange(Lq * 8, dtype=jnp.int32)[None, :]      # in-strip key
    col_idx = jnp.arange(Lq, dtype=jnp.int32)[None, :]
    qr8 = ((jnp.asarray(qlen, jnp.int32) + 7) // 8) * 8          # [B]
    tr8 = ((jnp.asarray(tlen, jnp.int32) + 7) // 8) * 8
    col_ok = col_idx < qr8[:, None]                              # [B, Lq]
    cell_ok_cols = jnp.repeat(col_ok, 8, axis=1)                 # [B, Lq*8]

    def strip_step(carry, s):
        (H, E, best, bkey, best2, b2key, prev2, x2, runmax_c) = carry
        tstrip = jax.lax.dynamic_slice_in_dim(t, s * 8, 8, axis=1)
        H, E, hs = _strip_core(q, H, E, tstrip, params, goe, ge, B, Lq)
        flat = jnp.transpose(hs, (1, 2, 0)).reshape(B, Lq * 8)   # visit order
        strip_ok = (s * 8) < tr8                                 # [B]
        row_ok = (s * 8 + (cell_idx & 7)) < tr8[:, None]
        visit = cell_ok_cols & row_ok & strip_ok[:, None]
        flat = jnp.where(visit, flat, NEG_BIG)
        key0 = (s * Lq * 8)
        keys = key0 + cell_idx
        # cell-level running max (inclusive), carried across strips
        R = jnp.maximum(jax.lax.cummax(flat, axis=1), runmax_c[:, None])
        # ---- primary best: first strict attainment = min key among max
        smax = jnp.max(flat, axis=1)
        skey = jnp.min(
            jnp.where(flat == smax[:, None], keys, INT_MAX), axis=1
        )
        take = (smax > best) | ((smax == best) & (skey < bkey))
        best_n = jnp.where(take, smax, best)
        bkey_n = jnp.where(take, skey, bkey)
        # ---- second best: candidates where h < R (strictly below the
        # running max including self), visited cells only
        cand = (flat < R) & visit
        ch = jnp.where(cand, flat, NEG_BIG)
        s2max = jnp.max(ch, axis=1)
        s2key = jnp.min(jnp.where(ch == s2max[:, None], keys, INT_MAX), axis=1)
        take2 = (s2max > best2) | ((s2max == best2) & (s2key < b2key))
        best2_n = jnp.where(take2, s2max, best2)
        b2key_n = jnp.where(take2, s2key, b2key)
        # ---- query-end-second quirk: per column segment c (8 cells):
        # after the segment, if prev2 < maxHH(end of segment): x2 = ridx;
        # prev2 = max(run_second_through_segment, prev2)
        seg = flat.reshape(B, Lq, 8)
        segR = jnp.maximum(jax.lax.cummax(jnp.max(seg, axis=2), axis=1),
                           runmax_c[:, None])               # runmax at seg end
        segcand = jnp.where(cand.reshape(B, Lq, 8), seg, NEG_BIG)
        seg2 = jnp.max(segcand, axis=2)                     # flagged max/seg
        run2 = jnp.maximum(jax.lax.cummax(seg2, axis=1), best2[:, None])
        prev2_before = jnp.concatenate(
            [prev2[:, None], run2[:, :-1]], axis=1
        )
        cond = (prev2_before < segR) & col_ok & strip_ok[:, None]
        lastc = jnp.max(jnp.where(cond, col_idx, -1), axis=1)
        x2_n = jnp.where(lastc >= 0, lastc, x2)
        prev2_n = jnp.maximum(prev2, run2[:, -1])
        runmax_n = R[:, -1]
        return (
            H, E, best_n, bkey_n, best2_n, b2key_n, prev2_n, x2_n, runmax_n
        ), None

    init = (
        jnp.zeros((B, Lq), jnp.int32),
        jnp.zeros((B, Lq), jnp.int32),
        jnp.zeros((B,), jnp.int32),
        jnp.full((B,), INT_MAX, jnp.int32),
        jnp.zeros((B,), jnp.int32),
        jnp.full((B,), INT_MAX, jnp.int32),
        jnp.zeros((B,), jnp.int32),          # prev_maxHH_second
        jnp.zeros((B,), jnp.int32),          # maxXY_x_second
        jnp.zeros((B,), jnp.int32),          # running max carry
    )
    (H, E, best, bkey, best2, b2key, prev2, x2, runmax), _ = jax.lax.scan(
        strip_step, init, jnp.arange(nstrips, dtype=jnp.int32)
    )

    def decode(key):
        cell = key >> 3
        j = cell % Lq
        i = (cell // Lq) * 8 + (key & 7)
        return j, i

    qend, tend = decode(bkey)
    q2, t2 = decode(b2key)
    z = best == 0
    qend = jnp.where(z, 0, qend)
    tend = jnp.where(z, 0, tend)
    z2 = best2 == 0
    t2 = jnp.where(z2, 0, t2)
    return best, qend, tend, best2, x2, t2


@functools.partial(jax.jit, static_argnames=("params",))
def _local_start_core(qr_arr, tr_arr, fwd_score, params: AlignmentParams):
    """Reverse-pass DP on pre-reversed word-aligned inputs; returns the
    recorded (query_start, target_start) per gold semantics.

    qr_arr/tr_arr: [B, Lq]/[B, Lt] reversed codes (N4 beyond extents)."""
    B, Lq = qr_arr.shape
    Lt = tr_arr.shape[1]
    goe = jnp.int32(params.gap_oe)
    ge = jnp.int32(params.gap_extend)
    nstrips = Lt // 8
    cell_idx = jnp.arange(Lq * 8, dtype=jnp.int32)[None, :]

    def strip_step(carry, s):
        H, E, best, bkey, runmax, kstar, found = carry
        tstrip = jax.lax.dynamic_slice_in_dim(tr_arr, s * 8, 8, axis=1)
        H, E, hs = _strip_core(qr_arr, H, E, tstrip, params, goe, ge, B, Lq)
        flat = jnp.transpose(hs, (1, 2, 0)).reshape(B, Lq * 8)
        keys = s * Lq * 8 + cell_idx
        R = jnp.maximum(jax.lax.cummax(flat, axis=1), runmax[:, None])
        # first key reaching fwd_score (if not already found)
        reach = R >= fwd_score[:, None]
        k_here = jnp.min(jnp.where(reach, keys, INT_MAX), axis=1)
        newly = (~found) & (k_here < INT_MAX)
        kstar = jnp.where(newly, k_here, kstar)
        # segment end of k*
        kend = (kstar >> 3) * 8 + 7
        # best tracking limited to keys <= kend once found; while not
        # found, track everything (kend may land in this strip)
        limit = jnp.where(found, jnp.int32(-1), kend)  # already-found strips: no more updates
        lim = jnp.where(newly, kend, limit)
        eligible = keys <= lim[:, None]
        fh = jnp.where(eligible, flat, NEG_BIG)
        smax = jnp.max(fh, axis=1)
        skey = jnp.min(jnp.where(fh == smax[:, None], keys, INT_MAX), axis=1)
        take = (smax > best) | ((smax == best) & (skey < bkey))
        best = jnp.where(take, smax, best)
        bkey = jnp.where(take, skey, bkey)
        found = found | newly
        runmax = R[:, -1]
        return (H, E, best, bkey, runmax, kstar, found), None

    init = (
        jnp.zeros((B, Lq), jnp.int32),
        jnp.zeros((B, Lq), jnp.int32),
        jnp.zeros((B,), jnp.int32),
        jnp.full((B,), INT_MAX, jnp.int32),
        jnp.zeros((B,), jnp.int32),
        jnp.full((B,), INT_MAX, jnp.int32),
        jnp.zeros((B,), bool),
    )
    (H, E, best, bkey, runmax, kstar, found), _ = jax.lax.scan(
        strip_step, init, jnp.arange(nstrips, dtype=jnp.int32)
    )
    cell = bkey >> 3
    cprime = cell % Lq            # reversed query column
    sstrip = (cell // Lq)
    r0 = bkey & 7
    return cprime, sstrip, r0


def local_align_with_start(q_np, t_np, qlen, tlen, params: AlignmentParams):
    """Full WITH_START path: forward (scores/ends) + reverse pass
    (starts, gold semantics incl. the skewed target coordinate).

    numpy in/out; q_np [B, Lq], t_np [B, Lt] N4-padded."""
    from genomics_tpu.ops import scan_align

    q_np = np.asarray(q_np)
    t_np = np.asarray(t_np)
    fwd = scan_align.local_align_batch(
        jnp.asarray(q_np), jnp.asarray(t_np), params
    )
    score = np.asarray(fwd.score)
    qend = np.asarray(fwd.query_end)
    tend = np.asarray(fwd.target_end)
    B, Lq = q_np.shape
    Lt = t_np.shape[1]
    qlen = np.asarray(qlen)
    tlen = np.asarray(tlen)
    qr8 = np.minimum((qend // 8) + 1, (qlen + 7) // 8) * 8
    tr8 = np.minimum((tend // 8) + 1, (tlen + 7) // 8) * 8
    # reversed word-aligned prefixes, N4 beyond
    qr_arr = np.full((B, Lq), N4, np.uint8)
    tr_arr = np.full((B, Lt), N4, np.uint8)
    for b in range(B):
        n = int(qr8[b])
        qr_arr[b, :n] = q_np[b, :n][::-1]
        m = int(tr8[b])
        tr_arr[b, :m] = t_np[b, :m][::-1]
    cprime, sstrip, r0 = _local_start_core(
        jnp.asarray(qr_arr), jnp.asarray(tr_arr), jnp.asarray(score), params
    )
    cprime = np.asarray(cprime)
    sstrip = np.asarray(sstrip)
    r0 = np.asarray(r0)
    qstart = qr8 - 1 - cprime
    # reference skew: maxXY_y = (gend_reg*8 - 1 - 8*s) + r0
    tstart = tr8 - 1 - 8 * sstrip + r0
    z = score == 0
    qstart = np.where(z, 0, qstart)
    tstart = np.where(z, 0, tstart)
    return score, qend, tend, qstart.astype(np.int32), tstart.astype(np.int32)
