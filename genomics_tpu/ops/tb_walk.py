"""Device-side traceback walk (the gasal_get_tb analog ON device).

The round-3 design emitted packed direction matrices to HBM and decoded
byte-CIGARs on the host (native/cigar.cpp) — correct, but it ships
O(Lq*Lt/8) bytes per alignment off the device.  GASAL2 itself walks the
matrices in a second device kernel (CDP/GASAL2/src/kernels/get_tb.h:
5-149) and only the byte-CIGAR leaves the GPU; this module is that
design point for TPU: a vectorized jnp walk (one lane per alignment,
fori over walk steps, gathers into the [Lt/8, Lq, B] nibble cube)
produces the per-step op sequence — O(Lq+Lt) BYTES per alignment, ~30x
smaller than the matrix — and the host only run-length-encodes it.

The state machine is a 1:1 vectorization of native/cigar.cpp decode_one
(itself the get_tb.h transcription): op_select/op_shift gap-chain
tracking, the LOCAL score-stop, X/M from the substitution bit.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

STOP = np.uint8(255)


@functools.partial(jax.jit, static_argnames=("params", "algo"))
def tb_walk_device(
    tb_sqb: jnp.ndarray,     # [Lt8, Lq, B] int32 packed nibbles
    qlen: jnp.ndarray,       # [B]
    tlen: jnp.ndarray,
    score: jnp.ndarray,      # [B] (local score-stop)
    qend: jnp.ndarray,
    tend: jnp.ndarray,
    params,
    algo: str = "local",
):
    """→ (ops [T, B] uint8 walk-order op codes (0=M 1=X 2=D 3=I,
    255=inactive), qstart [B], tstart [B], n_steps [B]).

    T = Lq + Lt upper-bounds the walk; the host RLE stops at the first
    255 per column."""
    Lt8, Lq, B = tb_sqb.shape
    Lt = Lt8 * 8
    T = Lq + Lt
    barange = jnp.arange(B)
    mt = jnp.int32(params.match)
    mm = jnp.int32(params.mismatch)
    goe = jnp.int32(params.gap_oe)
    ge = jnp.int32(params.gap_extend)
    is_local = algo == "local"

    if is_local:
        i0 = jnp.asarray(tend, jnp.int32)
        j0 = jnp.asarray(qend, jnp.int32)
        total = jnp.asarray(score, jnp.int32)
    else:
        i0 = jnp.asarray(tlen, jnp.int32)
        j0 = jnp.asarray(qlen, jnp.int32)
        total = jnp.zeros(B, jnp.int32)

    def step(carry, _):
        i, j, op_shift, op_select, curr, prev_op, active = carry
        inb = (i < Lt) & (j < Lq) & (i >= 0) & (j >= 0)
        word = tb_sqb[
            jnp.clip(i >> 3, 0, Lt8 - 1),
            jnp.clip(j, 0, Lq - 1),
            barange,
        ]
        cell_op = jnp.where(
            inb, (word >> (4 * (i & 7))) & 0xF, 0).astype(jnp.int32)
        op = (cell_op >> op_shift) & op_select
        op_to_fill = jnp.where((op == 0) | (op_select == 3), op, op_shift)
        reset = (op == 0) | ((op == 1) & (op_select == 3))
        to_gap = ((op == 2) | (op == 3)) & (op_select == 3)
        new_shift = jnp.where(reset, 0, jnp.where(to_gap, op, op_shift))
        new_select = jnp.where(reset, 3, 1)
        # local score reconstruction (decode_one:80-93)
        delta = jnp.where(
            (op_to_fill == 2) | (op_to_fill == 3),
            jnp.where(prev_op != op_to_fill, -goe, -ge),
            jnp.where(op_to_fill == 1, -mm, mt),
        )
        curr_new = curr + delta
        stop_score = is_local & active & (curr_new == total)
        emit = jnp.where(active, op_to_fill.astype(jnp.uint8), STOP)
        di = jnp.where((op_to_fill == 0) | (op_to_fill == 1)
                       | (op_to_fill == 2), 1, 0)
        dj = jnp.where((op_to_fill == 0) | (op_to_fill == 1)
                       | (op_to_fill == 3), 1, 0)
        i_new = jnp.where(active & ~stop_score, i - di, i)
        j_new = jnp.where(active & ~stop_score, j - dj, j)
        # when the score stop fires, i/j stay AT the stop cell (the
        # native decoder breaks before moving)
        i_stop = jnp.where(stop_score, i, i_new)
        j_stop = jnp.where(stop_score, j, j_new)
        ran_off = (i_new < 0) | (j_new < 0)
        active_new = active & ~stop_score & ~ran_off
        carry = (i_stop, j_stop, new_shift * jnp.where(active, 1, 0)
                 + jnp.where(active, 0, op_shift),
                 jnp.where(active, new_select, op_select),
                 jnp.where(active, curr_new, curr),
                 jnp.where(active, op_to_fill, prev_op),
                 active_new)
        return carry, emit

    init = (i0, j0, jnp.zeros(B, jnp.int32), jnp.full(B, 3, jnp.int32),
            jnp.zeros(B, jnp.int32), jnp.zeros(B, jnp.int32),
            jnp.ones(B, bool))
    # Chunked early-exit walk: the per-step cost is the [B]-lane random
    # gather (~18 ns/elem on v5e — XLA lowers general gather to a slow
    # per-element loop), so the win is doing FEWER steps, not cheaper
    # ones.  Walks end at the LOCAL score-stop / matrix edge long before
    # the worst-case T = Lq + Lt (a get_tb.h walk stops the same way),
    # so run CH-step unrolled chunks under a while_loop and stop as
    # soon as every lane is inactive.  Emitted rows beyond the exit
    # stay STOP-initialized — output is bit-identical to the full scan.
    CH = 16
    n_chunks = -(-T // CH)
    ops_buf = jnp.full((n_chunks * CH, B), STOP, jnp.uint8)

    def chunk_cond(state):
        k, carry, _ = state
        return (k < n_chunks) & carry[6].any()

    def chunk_body(state):
        k, carry, buf = state
        rows = []
        for _u in range(CH):
            prev = carry
            carry, emit = step(carry, None)
            # freeze state at exactly T steps (the last chunk may
            # overhang): the scan this replaces hard-stopped at T, and
            # a lane still active there must keep the step-T i/j so
            # qstart/tstart stay bit-identical
            valid = k * CH + _u < T
            carry = jax.tree_util.tree_map(
                lambda a, b: jnp.where(valid, a, b), carry, prev)
            rows.append(jnp.where(valid, emit, STOP))
        buf = jax.lax.dynamic_update_slice(
            buf, jnp.stack(rows), (k * CH, 0))
        return (k + 1, carry, buf)

    _, (fi, fj, _, _, _, _, _), ops = jax.lax.while_loop(
        chunk_cond, chunk_body, (jnp.int32(0), init, ops_buf))
    ops = ops[:T]
    if is_local:
        # decode_one's local epilogue: the stop cell's move HAS happened
        # for the ran-off case; when the score stop fired, qstart/tstart
        # are the stop cell minus the final move
        qstart = fj
        tstart = fi
    else:
        qstart = jnp.zeros(B, jnp.int32)
        tstart = jnp.zeros(B, jnp.int32)
    return ops, qstart, tstart


def rle_cigar(ops_np: np.ndarray, max_ops: int | None = None):
    """[T, B] uint8 op stream (255 = stop) → (cigars [B, max_ops] u8,
    n_ops [B]) in walk order with 63-run splitting — byte-identical to
    decode_one's emission."""
    T, B = ops_np.shape
    max_ops = max_ops or (T + 8)
    cigars = np.zeros((B, max_ops), np.uint8)
    n_ops = np.zeros(B, np.int32)
    opsT = ops_np.T  # [B, T]
    for b in range(B):
        row = opsT[b]
        stop = np.argmax(row == 255) if (row == 255).any() else T
        row = row[:stop]
        if not len(row):
            continue
        # run-length encode
        change = np.flatnonzero(np.diff(row)) + 1
        starts = np.concatenate([[0], change])
        ends = np.concatenate([change, [len(row)]])
        k = 0
        for s, e in zip(starts, ends):
            cnt = e - s
            opv = row[s]
            while cnt > 0:
                c = min(cnt, 63)
                if k < max_ops:
                    cigars[b, k] = opv | (c << 2)
                k += 1
                cnt -= c
        n_ops[b] = k
    return cigars, n_ops
