"""nGIA — distributed greedy clustering over a device mesh
(reference: CDP|Non-CDP /CLUSTER/cluster/ — the repo's MPI component).

Reference flow (func.cu): reads round-robin sharded across ranks; per
iteration each rank proposes its smallest unclustered GLOBAL id →
MPI_Gather → host min → MPI_Bcast of the id → MPI_Bcast of the full
Represent struct (length + 256-bin 4-mer histogram + packed read) from
the owner rank; then per-rank word filter + banded bit-parallel DP.
Because generateIndex pre-sorts reads and round-robin assigns global id
k to sorted position k, the winning representative each round is simply
the globally-first unclustered read — identical to the single-node
greedy order.

TPU-native mapping (SURVEY.md §5): one `data`-sharded array set over a
Mesh; representative selection is a global argmin (XLA inserts the
collective — no explicit gather/bcast); the representative's row is a
dynamic-slice (XLA materializes the broadcast); filter + banded LCS +
accept run shard-local inside ONE jitted step.  The same code runs
1-chip, 1-host or N-host (jax.distributed) unchanged.

Reference quirks replicated:
- kernel_makeWords' 4-mer seed has a C precedence bug
  (`r0<<4+r1<<2+r2` ≡ `(r0 << (4+r1)) << (2+r2)`, func.cu:131) — kept;
- the filter threshold uses min(netLengths) but `length*(1-sim)*4` with
  the ORIGINAL formula (func.cu:335-338);
- banded DP: shift = ceil(ceil(text - query*sim)/32) WORDS around the
  word diagonal (func.cu:377-388); out-of-band words stay all-ones;
- accept: matched >= ceil(min(qnet, tnet)*sim) (func.cu:465-468, note
  >= vs the single-node CLUSTER's >).
"""
from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from genomics_tpu.models.cluster import _pow2_pad as _cluster_pow2_pad
from genomics_tpu.utils.fasta import read_fasta

_BASE_MAP = np.full(256, 255, np.uint8)
for _c, _v in [("A", 0), ("C", 1), ("G", 2), ("T", 3), ("U", 3)]:
    _BASE_MAP[ord(_c)] = _v
    _BASE_MAP[ord(_c.lower())] = _v


def _prepare(seqs: list[str]):
    N = len(seqs)
    lengths = np.array([len(s) for s in seqs], np.int64)
    order = np.argsort(-lengths, kind="stable")
    seqs = [seqs[i] for i in order]
    lengths = lengths[order]
    nums = [
        _BASE_MAP[np.frombuffer(s.encode(), np.uint8)] for s in seqs
    ]
    nums = [a[a != 255] for a in nums]          # de-gap (baseToNumber)
    net = np.array([len(a) for a in nums], np.int64)
    # 256-bin 4-mer histogram with the reference's seed quirk
    words = np.zeros((N, 256), np.uint16)
    for i, a in enumerate(nums):
        if len(a) < 3:
            continue
        temp = ((int(a[0]) << (4 + int(a[1]))) << (2 + int(a[2]))) & 0xFF
        h = np.zeros(256, np.int64)
        for k in range(3, len(a)):
            temp = ((temp << 2) + int(a[k])) & 0xFF
            h[temp] += 1
        words[i] = np.minimum(h, 0xFFFF)
    # pack 2-bit planes, 32 bases/word, little-endian bit order
    W32 = int(net.max()) // 32 + 1
    low = np.zeros((N, W32), np.uint32)
    high = np.zeros((N, W32), np.uint32)
    codes = np.full((N, int(net.max())), 255, np.uint8)
    sh = np.arange(32, dtype=np.uint32)
    for i, a in enumerate(nums):
        codes[i, : len(a)] = a
        pad = np.zeros(W32 * 32, np.uint8)
        pad[: len(a)] = a
        pb = pad.reshape(W32, 32).astype(np.uint32)
        low[i] = ((pb & 1) << sh).sum(1, dtype=np.uint64).astype(np.uint32)
        high[i] = (((pb >> 1) & 1) << sh).sum(1, dtype=np.uint64).astype(np.uint32)
    return order, lengths, net, words, low, high, codes


def _round_step_factory(similarity: float, W: int, Lq: int):
    sim = float(similarity)

    def round_body(cluster, rep, words, net, low, high, codes):
        """One greedy round: filter + banded LCS vs representative `rep`
        for every unclustered read; returns the updated cluster array."""
        N = cluster.shape[0]
        rep_words = words[rep]
        rep_net = net[rep]
        rep_low = low[rep]
        rep_high = high[rep]

        uncl = cluster == -1
        # ---- word filter (kernel_filter, func.cu:321-344) ----
        s = jnp.sum(
            jnp.minimum(words, rep_words[None, :]).astype(jnp.int32), axis=1
        )
        mlen = jnp.minimum(net, rep_net)
        thr = mlen - jnp.ceil(mlen.astype(jnp.float32) * (1.0 - sim)).astype(
            jnp.int32
        ) * 4
        thr = jnp.maximum(thr, 1)
        jobs = uncl & (s >= thr)

        # ---- banded bit-parallel LCS (kernel_dynamic) ----
        shift_f = jnp.ceil(
            rep_net.astype(jnp.float32) - net.astype(jnp.float32) * sim
        )
        shift = jnp.ceil(shift_f / 32.0).astype(jnp.int32)       # [N] words
        widx = jnp.arange(W, dtype=jnp.int32)[None, :]

        def base_step(row, k):
            base = codes[:, k]
            active = (base != 255) & (k < net)
            iw = k // 32                                          # query word
            band = (widx >= (iw - shift)[:, None]) & (
                widx <= (iw + shift)[:, None]
            )
            ql = jnp.where((base & 1) > 0, jnp.uint32(0xFFFFFFFF), jnp.uint32(0))[
                :, None
            ]
            qh = jnp.where((base & 2) > 0, jnp.uint32(0xFFFFFFFF), jnp.uint32(0))[
                :, None
            ]
            match = (~(rep_low[None, :] ^ ql)) & (~(rep_high[None, :] ^ qh))
            x = row & match
            u = row & (~match)

            def cond(st):
                cin, prev = st
                return jnp.any(cin != prev)

            def body(st):
                cin, _ = st
                t5 = row + cin
                c1 = (t5 < row).astype(jnp.uint32)
                t5b = t5 + x
                c2 = (t5b < x).astype(jnp.uint32)
                cout = (c1 | c2) & band.astype(jnp.uint32)
                cin_new = jnp.concatenate(
                    [jnp.zeros((N, 1), jnp.uint32), cout[:, :-1]], axis=1
                )
                return jnp.maximum(cin_new, cin), cin

            cin0 = jnp.zeros((N, W), jnp.uint32)
            cin, _ = jax.lax.while_loop(
                cond, body, (cin0, jnp.full((N, W), 1, jnp.uint32))
            )
            newrow = (row + cin + x) | u
            upd = active[:, None] & band
            return jnp.where(upd, newrow, row), None

        row0 = jnp.full((N, W), 0xFFFFFFFF, jnp.uint32)
        row, _ = jax.lax.scan(base_step, row0, jnp.arange(Lq, dtype=jnp.int32))
        bits_in_word = jnp.clip(rep_net - jnp.arange(W, dtype=jnp.int32) * 32, 0, 32)
        mask = jnp.where(
            bits_in_word >= 32,
            jnp.uint32(0xFFFFFFFF),
            (jnp.uint32(1) << bits_in_word.astype(jnp.uint32)) - 1,
        )
        matched = jnp.sum(
            jax.lax.population_count((~row) & mask[None, :]), axis=1
        ).astype(jnp.int32)
        cutoff = jnp.ceil(
            jnp.minimum(net, rep_net).astype(jnp.float32) * sim
        ).astype(jnp.int32)
        accept = jobs & (matched >= cutoff)
        return jnp.where(accept, rep, cluster)

    round_step = jax.jit(round_body)

    @functools.partial(jax.jit, static_argnames=("k_rounds",))
    def rounds_step(cluster, words, net, low, high, codes, k_rounds: int):
        """Up to k_rounds greedy rounds in ONE dispatch: representative
        selection (global argmin over unclustered = first -1 in the
        sorted order — the reference's Gather+min+Bcast, func.cu:306-318)
        is folded into the jitted loop, so the host syncs once per
        k_rounds instead of once per representative."""

        def cond(state):
            i, cluster = state
            return (i < k_rounds) & jnp.any(cluster == -1)

        def body(state):
            i, cluster = state
            rep = jnp.argmax(cluster == -1).astype(jnp.int32)
            cluster = round_body(cluster, rep, words, net, low, high, codes)
            return (i + 1, cluster)

        _, cluster = jax.lax.while_loop(cond, body, (jnp.int32(0), cluster))
        return cluster

    return round_step, rounds_step


def _spec_accept_factory(similarity: float, W: int, Lq: int, S: int,
                         maxs: int = -1):
    """Speculative accept matrix: S candidate representatives filtered
    + banded-LCS'd against ALL reads in ONE dispatch — the CDP tree's
    kernel_iteration design (CDP/CLUSTER/func.cu:722-820) lifted into
    the distributed loop, where the reference pays a Gather + 2xBcast
    per representative (func.cu:306-318).  Same per-cell semantics as
    _round_step_factory (quirks included); conflicts are resolved
    serially-equivalently on the host."""
    sim = float(similarity)

    @jax.jit
    def accept_body(reps, jobs, words_a, net_a, low_a, high_a, codes_a):
        """reps [S], jobs [J] — indices; the per-read arrays are gathered
        down to the unclustered job set inside the dispatch (J shrinks
        as clustering progresses; full-N rounds wasted ~2x)."""
        words = jnp.take(words_a, jobs, axis=0)
        net = jnp.take(net_a, jobs)
        codes = jnp.take(codes_a, jobs, axis=0)
        N = jobs.shape[0]
        rep_words = words_a[reps]         # [S, 256]
        rep_net = net_a[reps]             # [S]
        rep_low = low_a[reps]             # [S, W]
        rep_high = high_a[reps]

        # ---- word filter (func.cu:321-344), [S, N] ----
        s = jnp.sum(
            jnp.minimum(words[None, :, :].astype(jnp.int32),
                        rep_words[:, None, :].astype(jnp.int32)), axis=2)
        mlen = jnp.minimum(net[None, :], rep_net[:, None])
        thr = mlen - jnp.ceil(
            mlen.astype(jnp.float32) * (1.0 - sim)).astype(jnp.int32) * 4
        jobs = s >= jnp.maximum(thr, 1)

        # ---- banded bit-parallel LCS (kernel_dynamic), [S, N, W] ----
        shift_f = jnp.ceil(
            rep_net[:, None].astype(jnp.float32)
            - net[None, :].astype(jnp.float32) * sim)
        shift = jnp.ceil(shift_f / 32.0).astype(jnp.int32)     # [S, N]

        # band-sliced step: the band [iw-shift, iw+shift] lies inside
        # the static window [iw-maxs, iw+maxs] (shift <= maxs by
        # construction), and carries never cross the band edge (cout is
        # band-masked), so only a Bw-word dynamic slice of the row
        # state is read/updated per step — W/Bw less HBM traffic, the
        # bound for long reads.  maxs < 0 or Bw >= W → full-width path.
        Bw = 2 * maxs + 1 if maxs >= 0 else W
        sliced = 0 <= maxs and Bw < W

        def base_step(row, k):
            base = codes[:, k]
            active = (base != 255) & (k < net)                 # [N]
            iw = k // 32
            if sliced:
                start = jnp.clip(iw - maxs, 0, W - Bw)
                row_sl = jax.lax.dynamic_slice(
                    row, (0, 0, start), (S, N, Bw))
                rl = jax.lax.dynamic_slice(rep_low, (0, start), (S, Bw))
                rh = jax.lax.dynamic_slice(rep_high, (0, start), (S, Bw))
                gw = start + jnp.arange(Bw, dtype=jnp.int32)[None, None, :]
            else:
                start = 0
                row_sl = row
                rl, rh = rep_low, rep_high
                gw = jnp.arange(W, dtype=jnp.int32)[None, None, :]
            band = (gw >= (iw - shift)[..., None]) & (
                gw <= (iw + shift)[..., None])                 # [S, N, Bw]
            ql = jnp.where((base & 1) > 0, jnp.uint32(0xFFFFFFFF),
                           jnp.uint32(0))[None, :, None]
            qh = jnp.where((base & 2) > 0, jnp.uint32(0xFFFFFFFF),
                           jnp.uint32(0))[None, :, None]
            match = (~(rl[:, None, :] ^ ql)) & \
                (~(rh[:, None, :] ^ qh))
            x = row_sl & match
            u = row_sl & (~match)
            BW = row_sl.shape[2]

            def cond(st):
                cin, prev = st
                return jnp.any(cin != prev)

            def body(st):
                cin, _ = st
                t5 = row_sl + cin
                c1 = (t5 < row_sl).astype(jnp.uint32)
                t5b = t5 + x
                c2 = (t5b < x).astype(jnp.uint32)
                cout = (c1 | c2) & band.astype(jnp.uint32)
                cin_new = jnp.concatenate(
                    [jnp.zeros((S, N, 1), jnp.uint32), cout[:, :, :-1]],
                    axis=2)
                return jnp.maximum(cin_new, cin), cin

            cin0 = jnp.zeros((S, N, BW), jnp.uint32)
            cin, _ = jax.lax.while_loop(
                cond, body, (cin0, jnp.full((S, N, BW), 1, jnp.uint32)))
            newrow = (row_sl + cin + x) | u
            upd = active[None, :, None] & band
            new_sl = jnp.where(upd, newrow, row_sl)
            if sliced:
                row = jax.lax.dynamic_update_slice(
                    row, new_sl, (0, 0, start))
            else:
                row = new_sl
            return row, None

        row0 = jnp.full((S, N, W), 0xFFFFFFFF, jnp.uint32)
        row, _ = jax.lax.scan(base_step, row0,
                              jnp.arange(Lq, dtype=jnp.int32))
        bits_in_word = jnp.clip(
            rep_net[:, None] - jnp.arange(W, dtype=jnp.int32)[None, :] * 32,
            0, 32)
        mask = jnp.where(
            bits_in_word >= 32, jnp.uint32(0xFFFFFFFF),
            (jnp.uint32(1) << bits_in_word.astype(jnp.uint32)) - 1)
        matched = jnp.sum(
            jax.lax.population_count((~row) & mask[:, None, :]),
            axis=2).astype(jnp.int32)
        cutoff = jnp.ceil(
            jnp.minimum(net[None, :], rep_net[:, None]).astype(jnp.float32)
            * sim).astype(jnp.int32)
        return (jobs & (matched >= cutoff)).astype(jnp.uint8)

    return accept_body


@dataclasses.dataclass
class NgiaResult:
    cluster: np.ndarray
    order: np.ndarray
    n_clusters: int


def cluster_distributed(
    seqs: list[str],
    similarity: float = 0.95,
    mesh=None,
    speculate: int = 1,
) -> NgiaResult:
    """Distributed greedy clustering.  If `mesh` is given, the per-read
    arrays are sharded over its `data` axis and XLA partitions every
    round step (collectives over ICI/DCN); otherwise single-device.
    speculate=S > 1 evaluates S candidate representatives per dispatch
    (CDP kernel_iteration) with serial-equivalent host resolution —
    identical clustering, ~S/2 fewer round trips."""
    order, lengths, net, words, low, high, codes = _prepare(seqs)
    N = len(seqs)
    W = low.shape[1]
    Lq = codes.shape[1]
    arrays = [
        jnp.asarray(words),
        jnp.asarray(net, jnp.int32),
        jnp.asarray(low),
        jnp.asarray(high),
        jnp.asarray(codes),
    ]
    if mesh is not None:
        # put_global builds the sharded arrays per-process (each process
        # materializes only its addressable shards) — the same code path
        # for 1 process or N (jax.distributed), replacing the reference's
        # round-robin MPI shard (func.cu:152-164)
        from genomics_tpu.parallel.multihost import put_global

        arrays = [put_global(mesh, np.asarray(a)) for a in arrays]
    words_d, net_d, low_d, high_d, codes_d = arrays

    if speculate > 1:
        S = int(speculate)
        # static band-window bound: reads sorted desc, so rep_net <=
        # net_max and job net >= net_min → every per-pair shift fits
        maxs = int(max(math.ceil(math.ceil(
            float(net.max()) - float(net.min()) * similarity) / 32.0), 0))
        accept_fn = _spec_accept_factory(similarity, W, Lq, S, maxs)
        cluster = np.full(N, -1, np.int64)
        pos = 0
        while pos < N:
            cands = []
            k = pos
            while k < N and len(cands) < S:
                if cluster[k] == -1:
                    cands.append(k)
                k += 1
            if not cands:
                break
            cands_a = np.array(cands)
            cands_p = np.concatenate(
                [cands_a, np.full(S - len(cands_a), cands_a[0])])
            jobs = np.nonzero(cluster == -1)[0]
            # pow2 bucket for shape stability (shared cluster helper —
            # one padding implementation to keep correct)
            jobs_p = _cluster_pow2_pad(jobs, cap=1 << 30)
            A = np.asarray(accept_fn(
                jnp.asarray(cands_p, jnp.int32),
                jnp.asarray(jobs_p, jnp.int32),
                words_d, net_d, low_d, high_d, codes_d,
            ))[: len(cands_a), : len(jobs)] != 0         # [S, J]
            # serial-equivalent resolution (same rule as the CLUSTER
            # speculative path): candidates ascending; a candidate is a
            # valid rep iff no earlier valid rep accepted it
            for si, c in enumerate(cands_a):
                if cluster[c] != -1:
                    continue
                cluster[c] = c
                take = A[si] & (cluster[jobs] == -1)
                cluster[jobs[np.nonzero(take)[0]]] = c
            pos = int(cands_a[-1]) + 1
        n = int((cluster == np.arange(N)).sum())
        return NgiaResult(cluster=cluster, order=order, n_clusters=n)

    _, rounds = _round_step_factory(similarity, W, Lq)

    if mesh is not None:
        from genomics_tpu.parallel.multihost import put_global

        cluster = put_global(mesh, np.full((N,), -1, np.int32))
    else:
        cluster = jnp.full((N,), -1, jnp.int32)
    # one device<->host sync per k_rounds representatives (the reference
    # pays a Gather + 2 Bcast per representative; here rep-selection is
    # in-graph and only the "anything left?" check reaches the host)
    k_rounds = 32
    while True:
        cluster = rounds(
            cluster, words_d, net_d, low_d, high_d, codes_d, k_rounds=k_rounds
        )
        if not bool(jnp.any(cluster == -1)):
            break
    from genomics_tpu.parallel.multihost import fetch

    c_host = fetch(cluster)   # MPI_Gather analog (func.cu:520)
    n = int((c_host == np.arange(N)).sum())
    return NgiaResult(cluster=c_host, order=order, n_clusters=n)


def run_file(
    input_file: str,
    output_file: str | None = None,
    similarity: float = 0.95,
    mesh=None,
) -> NgiaResult:
    recs = read_fasta(input_file)
    res = cluster_distributed([r.seq for r in recs], similarity, mesh=mesh)
    if output_file:
        with open(output_file, "w") as fh:
            for i in np.nonzero(res.cluster == np.arange(len(recs)))[0]:
                orig = recs[res.order[i]]
                fh.write(f">{orig.name}\n{orig.seq}\n")
    return res
