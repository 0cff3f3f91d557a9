"""Bucketed batched dispatch — the JAX-native replacement for both the
reference's CDP device-side work spawning and GASAL2's stream pipeline.

Where GASAL2 fills pinned host pages, grows device buffers, and enqueues
pack/align/traceback kernels on a cudaStream (gasal_aln_async,
CDP/GASAL2/src/gasal_align.cu:55-333), this engine:

1. buckets jobs by (query_len, target_len) into static padded shapes
   (bucket edges are powers-of-two-ish multiples of 8 — the jit-static
   generalization of the compile-time MAX_QUERY_LEN macro),
2. pads each bucket to [B128, Lq, Lt] device arrays and dispatches the
   Pallas kernel (jit caches per bucket shape — the "2x growth loop"
   becomes a compile cache),
3. relies on JAX async dispatch for compute/transfer overlap (the
   cudaStreamQuery/is_free double-buffering analog), and
4. decodes tracebacks to byte-CIGARs on the host via the native C++
   decoder (runtime/native.py).

Results come back in submission order regardless of bucketing.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

from genomics_tpu.core import golds
from genomics_tpu.core.encoding import N4, encode4
from genomics_tpu.core.scoring import AlignmentParams, AlgoType, SemiGlobalSkip
from genomics_tpu.ops import pallas_align, scan_align
from genomics_tpu.runtime import native

LANES = 128


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def default_buckets(max_len: int = 4096):
    """Bucket edges for sequence lengths: multiples of 8 up to 64, then
    ~1.5x geometric growth (keeps pad waste < ~33%)."""
    edges = [8, 16, 24, 32, 48, 64]
    v = 64
    while v < max_len:
        v = _round_up(int(v * 1.5), 8)
        edges.append(v)
    return edges


def _bucket_of(n: int, edges) -> int:
    for e in edges:
        if n <= e:
            return e
    return _round_up(n, 8)


@dataclasses.dataclass
class AlignmentJob:
    """One alignment result (order matches submission)."""

    score: int
    query_end: int = 0
    target_end: int = 0
    query_start: int = 0
    target_start: int = 0
    cigar: np.ndarray | None = None   # byte-CIGAR (walk order)
    # second-best (params.second_best; gasal_res_t secondBest fields,
    # reference: CDP/GASAL2/src/res.cpp:8-76 / local_kernel_template.h)
    score_second: int = 0
    query_end_second: int = 0
    target_end_second: int = 0

    @property
    def cigar_string(self) -> str:
        if self.cigar is None:
            return ""
        return golds.cigar_to_string(self.cigar)


class AlignEngine:
    """Batched alignment engine over one of the five DP algorithms.

    >>> eng = AlignEngine(AlignmentParams(algo=AlgoType.LOCAL), with_tb=True)
    >>> results = eng.align(queries, targets)     # lists of str/bytes
    """

    def __init__(
        self,
        params: AlignmentParams,
        with_tb: bool = False,
        head: SemiGlobalSkip = SemiGlobalSkip.NONE,
        tail: SemiGlobalSkip = SemiGlobalSkip.NONE,
        band_width_tiles: int = 4,
        buckets: Sequence[int] | None = None,
        use_pallas: bool | None = None,
        score_only: bool = False,
    ):
        self.params = params
        self.with_tb = with_tb or params.with_traceback
        self.head = head
        self.tail = tail
        self.band_width_tiles = band_width_tiles
        self.buckets = list(buckets) if buckets else default_buckets()
        # score-only mode: skip end-position tracking and dispatch the
        # fastest kernels (the reference's psa benchmarks are score-only
        # SW-Gotoh runs, CDP/NvB/prototypes/psa/README.md:28-44)
        self.score_only = score_only and params.algo in (
            AlgoType.LOCAL, AlgoType.KSW, AlgoType.BANDED)
        # auto: compiled Pallas on TPU, scan engines elsewhere (interpret
        # mode is only for parity tests — too slow for real dispatch)
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        self.use_pallas = use_pallas

    # -- device dispatch per bucket -------------------------------------

    def _run_bucket(self, q, t, qlen, tlen, h0, has_n=True):
        p = self.params
        algo = p.algo
        qd, td = jnp.asarray(q), jnp.asarray(t)
        ql, tl = jnp.asarray(qlen), jnp.asarray(tlen)
        if algo == AlgoType.LOCAL:
            if self.score_only and self.use_pallas and not self.with_tb:
                score = pallas_align.local_align_scores_tpu(
                    qd, td, p, has_n=has_n
                )
                zero = jnp.zeros_like(score)
                return scan_align.AlignResult(score, zero, zero, None)
            if self.use_pallas:
                # tb in the kernels' native [Lt8, Lq, B] layout, then
                # the WALK runs on device too (ops/tb_walk — the
                # gasal_get_tb-on-GPU design point): only the O(Lq+Lt)
                # op stream leaves the chip, ~30x less transfer than
                # the nibble cube
                res = pallas_align.local_align_tpu(
                    qd, td, p, with_tb=self.with_tb, tb_layout="sqb")
                if self.with_tb:
                    from genomics_tpu.ops import tb_walk

                    ops, qst, tst = tb_walk.tb_walk_device(
                        res.tb, ql, tl, res.score, res.query_end,
                        res.target_end, p, algo="local")
                    return scan_align.AlignResult(
                        res.score, res.query_end, res.target_end,
                        (ops, qst, tst))
                return res
            return scan_align.local_align_batch(qd, td, p, with_tb=self.with_tb)
        if algo == AlgoType.GLOBAL:
            if self.use_pallas:
                return pallas_align.global_align_tpu(
                    qd, td, ql, tl, p, with_tb=self.with_tb
                )
            return scan_align.global_align_batch(
                qd, td, ql, tl, p, with_tb=self.with_tb
            )
        if algo == AlgoType.SEMI_GLOBAL:
            if self.use_pallas:
                return pallas_align.semiglobal_align_tpu(
                    qd, td, ql, tl, p, head=self.head, tail=self.tail,
                    with_tb=self.with_tb,
                )
            return scan_align.semiglobal_align_batch(
                qd, td, ql, tl, p, head=self.head, tail=self.tail,
                with_tb=self.with_tb,
            )
        if algo == AlgoType.KSW:
            if self.use_pallas:
                from genomics_tpu.ops import pallas_ksw

                if self.score_only:
                    score = pallas_ksw.ksw_align_scores_tpu(
                        qd, td, ql, tl, jnp.asarray(h0), p, has_n=has_n)
                    zero = jnp.zeros_like(score)
                    return scan_align.AlignResult(score, zero, zero, None)
                return pallas_ksw.ksw_align_tpu(
                    qd, td, ql, tl, jnp.asarray(h0), p
                )
            return scan_align.ksw_align_batch(
                qd, td, ql, tl, jnp.asarray(h0), p
            )
        if algo == AlgoType.BANDED:
            if self.use_pallas:
                from genomics_tpu.ops import pallas_ksw

                if self.score_only:
                    score = pallas_ksw.banded_align_scores_tpu(
                        qd, td, ql, tl, p,
                        band_width_tiles=self.band_width_tiles,
                        has_n=has_n)
                    zero = jnp.zeros_like(score)
                    return scan_align.AlignResult(score, zero, zero, None)
                return pallas_ksw.banded_align_tpu(
                    qd, td, ql, tl, p, band_width_tiles=self.band_width_tiles
                )
            return scan_align.banded_align_batch(
                qd, td, ql, tl, p, band_width_tiles=self.band_width_tiles
            )
        raise ValueError(f"unsupported algo {algo}")

    # -- public API ------------------------------------------------------

    def align(
        self,
        queries: Sequence,
        targets: Sequence,
        h0: Sequence[int] | None = None,
    ) -> list[AlignmentJob]:
        """Align pairs; returns results in submission order."""
        return self._collect(*self._dispatch(queries, targets, h0))

    def _dispatch(self, queries, targets, h0=None):
        """Enqueue all bucket kernels (JAX async dispatch — device work
        begins immediately); returns the pending state for _collect."""
        if len(queries) != len(targets):
            raise ValueError(
                f"queries/targets length mismatch: {len(queries)} vs "
                f"{len(targets)}"
            )
        n = len(queries)
        enc_q = [encode4(s) if isinstance(s, (str, bytes)) else np.asarray(s, np.uint8)
                 for s in queries]
        enc_t = [encode4(s) if isinstance(s, (str, bytes)) else np.asarray(s, np.uint8)
                 for s in targets]
        h0 = np.asarray(h0 if h0 is not None else np.zeros(n), np.int32)

        # bucket by padded (qlen, tlen)
        groups: dict[tuple[int, int], list[int]] = {}
        for i, (eq, et) in enumerate(zip(enc_q, enc_t)):
            key = (_bucket_of(len(eq), self.buckets), _bucket_of(len(et), self.buckets))
            groups.setdefault(key, []).append(i)

        # dispatch all buckets (async), then collect.  Large buckets are
        # SPLIT into inter-task tiles (2048, then 1024) plus a lane-tile
        # remainder instead of rounding the whole bucket up — pad waste
        # stays < 128/B instead of up to 2x (e.g. 1025 jobs used to pad
        # to 2048; now: one 1024-tile + one 128-tile).
        pending = []
        chunked: list[tuple[tuple[int, int], list[int]]] = []
        for key, idxs in groups.items():
            if not self.use_pallas:
                chunked.append((key, idxs))
                continue
            pos, n_jobs = 0, len(idxs)
            while n_jobs - pos >= 2048:
                chunked.append((key, idxs[pos:pos + 2048]))
                pos += 2048
            if n_jobs - pos >= 1024:
                chunked.append((key, idxs[pos:pos + 1024]))
                pos += 1024
            if pos < n_jobs:
                chunked.append((key, idxs[pos:]))
        for (lq, lt), idxs in chunked:
            mult = LANES if self.use_pallas else 8
            if (
                self.params.second_best
                and self.params.algo == AlgoType.LOCAL
                and self.use_pallas
                and not self.with_tb
            ):
                # pad straight to the inline second-best kernel's floor:
                # 8x pad compute on a tiny chunk beats the scan engine's
                # minutes-long TPU compile + ~10x slower cells
                mult = pallas_align.INTERTASK_MIN
            B = _round_up(len(idxs), mult)
            qb = np.full((B, lq), N4, np.uint8)
            tb = np.full((B, lt), N4, np.uint8)
            qlen = np.ones(B, np.int32)
            tlen = np.ones(B, np.int32)
            hb = np.zeros(B, np.int32)
            has_n = False
            for k, i in enumerate(idxs):
                qb[k, : len(enc_q[i])] = enc_q[i]
                tb[k, : len(enc_t[i])] = enc_t[i]
                qlen[k] = len(enc_q[i])
                tlen[k] = len(enc_t[i])
                hb[k] = h0[i]
                has_n = has_n or (N4 in enc_q[i]) or (N4 in enc_t[i])
            second = None
            want_second = (
                self.params.second_best and self.params.algo == AlgoType.LOCAL
            )
            if (
                want_second
                and self.use_pallas
                and not self.with_tb
                and B % pallas_align.INTERTASK_MIN == 0
                and lq % 8 == 0
                and lt % 8 == 0
            ):
                # inline second-best: ONE Pallas pass computes primary +
                # second, exactly as the GASAL2 kernel does
                # (local_kernel_template.h:147-163)
                sec = pallas_align.local_align_second_tpu(
                    jnp.asarray(qb), jnp.asarray(tb), qlen, tlen, self.params
                )
                res = scan_align.AlignResult(sec[0], sec[1], sec[2], None)
                second = sec
            else:
                res = self._run_bucket(
                    qb, tb, qlen, tlen, hb, has_n=bool(has_n)
                )
                if want_second:
                    # visit-order scan engine fallback (small buckets /
                    # with_tb combos)
                    from genomics_tpu.ops import scan_align_full

                    second = scan_align_full.local_align_second_batch(
                        jnp.asarray(qb), jnp.asarray(tb),
                        jnp.asarray(qlen), jnp.asarray(tlen), self.params
                    )
            pending.append(((lq, lt), idxs, qlen, tlen, qb, tb, res, second))
        return pending, n

    def _collect(self, pending, n):
        """Materialize results (blocks on the device work)."""
        # start EVERY chunk's D2H copies first (copy_to_host_async), so
        # transfers overlap instead of paying one tunnel round trip per
        # np.asarray — the per-RPC latency was the mapper's biggest cost
        # after the device TB walk landed
        for entry in pending:
            res, second = entry[6], entry[7]
            arrs = [res.score, res.query_end, res.target_end]
            if isinstance(res.tb, tuple):
                arrs += list(res.tb)
            elif res.tb is not None:
                arrs.append(res.tb)
            if second is not None:
                arrs += [second[3], second[4], second[5]]
            for a in arrs:
                if hasattr(a, "copy_to_host_async"):
                    try:
                        a.copy_to_host_async()
                    except Exception:
                        pass
        out: list[AlignmentJob | None] = [None] * n
        for (lq, lt), idxs, qlen, tlen, qb, tb, res, second in pending:
            score = np.asarray(res.score)
            qend = np.asarray(res.query_end)
            tend = np.asarray(res.target_end)
            starts = None
            if self.params.compute_start and not self.with_tb:
                # GASAL2 WITH_START reverse passes (gold semantics; when
                # with_tb is on, starts come from the CIGAR walk instead,
                # exactly as in GASAL2)
                from genomics_tpu.ops import scan_align_full

                if self.params.algo == AlgoType.LOCAL:
                    _s, _qe, _te, qst, tst = scan_align_full.local_align_with_start(
                        qb, tb, qlen, tlen, self.params
                    )
                    starts = (qst, tst)
                elif self.params.algo == AlgoType.SEMI_GLOBAL:
                    _s, _qe, _te, qst, tst = (
                        scan_align_full.semiglobal_align_with_start(
                            qb, tb, qlen, tlen, self.params,
                            head=self.head, tail=self.tail,
                        )
                    )
                    starts = (qst, tst)
            cigars = n_ops = qstart = tstart = None
            if self.with_tb and isinstance(res.tb, tuple):
                # device-walked op streams (LOCAL pallas path): host
                # work is just the run-length encode
                from genomics_tpu.ops import tb_walk

                ops_np = np.asarray(res.tb[0])
                cigars, n_ops = tb_walk.rle_cigar(ops_np)
                qstart = np.asarray(res.tb[1])
                tstart = np.asarray(res.tb[2])
            elif self.with_tb and res.tb is not None:
                packed = np.asarray(res.tb)
                tb_layout = "bsq"
                if packed.dtype == np.uint8:
                    # scan engine emits unpacked [B, Lt, Lq] nibbles; pack
                    packed = _pack_nibbles_np(packed)
                elif (self.use_pallas
                      and self.params.algo == AlgoType.LOCAL):
                    # _run_bucket always requests the pallas-local
                    # native layout, so this is deterministic
                    tb_layout = "sqb"
                head_q = head_t = False
                dec_qend, dec_tend = qend, tend
                if self.params.algo == AlgoType.LOCAL:
                    algo = "local"
                elif self.params.algo == AlgoType.SEMI_GLOBAL:
                    # semiglobal CIGAR extension (golds.decode_tb):
                    # resolve the walk's start cell from the kernel's
                    # quirky reported ends per the tail policy, then
                    # decode with HEAD flags controlling the D/I pad
                    algo = "semiglobal"
                    head_q = self.head in (SemiGlobalSkip.QUERY,
                                           SemiGlobalSkip.BOTH)
                    head_t = self.head in (SemiGlobalSkip.TARGET,
                                           SemiGlobalSkip.BOTH)
                    tail_q = self.tail in (SemiGlobalSkip.QUERY,
                                           SemiGlobalSkip.BOTH)
                    tail_t = self.tail in (SemiGlobalSkip.TARGET,
                                           SemiGlobalSkip.BOTH)
                    if tail_q:
                        # kernel fixup rule: the query-tail sweep won
                        # iff maxXY_x moved off its ref_len init
                        qwin = qend != tlen
                        j0 = np.where(qwin, qend, qlen - 1)
                        i0 = np.where(
                            qwin, tlen - 1, tend if tail_t else tlen - 1
                        )
                    elif tail_t:
                        j0, i0 = qlen - 1, tend
                    else:
                        j0, i0 = qlen - 1, tlen - 1
                    dec_qend = np.asarray(j0, np.int32)
                    dec_tend = np.asarray(i0, np.int32)
                else:
                    algo = "global"
                cigars, n_ops, qstart, tstart = native.decode_tb_batch(
                    packed, qlen, tlen, algo, self.params,
                    score=score, qend=dec_qend, tend=dec_tend,
                    head_q=head_q, head_t=head_t, layout=tb_layout,
                )
            if second is not None:
                s2 = np.asarray(second[3])
                q2 = np.asarray(second[4])
                t2 = np.asarray(second[5])
            for k, i in enumerate(idxs):
                job = AlignmentJob(
                    score=int(score[k]),
                    query_end=int(qend[k]),
                    target_end=int(tend[k]),
                )
                if cigars is not None:
                    job.cigar = cigars[k, : n_ops[k]].copy()
                    job.query_start = int(qstart[k])
                    job.target_start = int(tstart[k])
                elif starts is not None:
                    job.query_start = int(starts[0][k])
                    job.target_start = int(starts[1][k])
                if second is not None:
                    job.score_second = int(s2[k])
                    job.query_end_second = int(q2[k])
                    job.target_end_second = int(t2[k])
                out[i] = job
        return out  # type: ignore[return-value]


def _pack_nibbles_np(nibs: np.ndarray) -> np.ndarray:
    """[B, Lt, Lq] uint8 nibbles → [B, Lt//8, Lq] int32 packed (8 target
    rows per word — the Pallas kernels' layout)."""
    B, Lt, Lq = nibs.shape
    r = nibs.reshape(B, Lt // 8, 8, Lq).astype(np.int64)
    shifts = 4 * np.arange(8, dtype=np.int64)
    return (r << shifts[None, None, :, None]).sum(axis=2).astype(np.int32)


class AsyncHandle:
    """In-flight batch: device work was dispatched asynchronously at
    submit time; `done()` is a true non-blocking poll of the device
    arrays (jax.Array.is_ready — the cudaStreamQuery analog behind
    gasal_is_aln_async_done); `result()` materializes."""

    def __init__(self, engine, pending, finisher):
        self._pending = pending
        self._finisher = finisher
        self._result = None
        self._done = False

    def done(self) -> bool:
        if self._done:
            return True
        for entry in self._pending:
            res = entry[6]
            for arr in (res.score, res.query_end, res.target_end):
                if hasattr(arr, "is_ready") and not arr.is_ready():
                    return False
        return True

    def result(self) -> list[AlignmentJob]:
        if not self._done:
            self._result = self._finisher()
            self._done = True
        return self._result


def _engine_align_async(self, queries, targets, h0=None):
    """Submit a batch; device work starts now, host returns immediately.

    >>> h1 = eng.align_async(q1, t1)   # device busy with batch 1
    >>> h2 = eng.align_async(q2, t2)   # prep + enqueue batch 2 meanwhile
    >>> r1, r2 = h1.result(), h2.result()
    """
    state = self._dispatch(queries, targets, h0)
    return AsyncHandle(self, state[0], lambda s=state: self._collect(*s))


AlignEngine.align_async = _engine_align_async
