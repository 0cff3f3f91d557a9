"""Ablation: where does the local-kernel step time go? (scratch, not shipped)"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from genomics_tpu.ops.pallas_align import (
    LANES, NEG_BIG, _fscan_rows, _row_iota, _shift_down_rows,
    _sub_scores_tile,
)
from genomics_tpu.core.scoring import AlignmentParams

params = AlignmentParams()
B, Lq, Lt, CHAIN = 16384, 152, 152, 30


def make_kernel(mode):
    def kern(q_ref, t_ref, out_score, *, Lq, Lt):
        goe = jnp.int32(params.gap_oe)
        ge = jnp.int32(params.gap_extend)
        q_tile = q_ref[...]
        zero = jnp.zeros((Lq, LANES), jnp.int32)
        rows = _row_iota(Lq)

        def step(i, carry):
            H, E, best, bkey = carry
            t_row = t_ref[pl.ds(i, 1), :]
            sub = _sub_scores_tile(q_tile, t_row, params.match,
                                   params.mismatch, params.n_penalty, False)
            tmp = _shift_down_rows(H, jnp.int32(0)) + sub
            if mode == "nofscan":
                f_used = tmp - goe
            else:
                f_used = _fscan_rows(tmp - goe, zero, ge)
            h = jnp.maximum(jnp.maximum(tmp, f_used), jnp.maximum(E, 0))
            E_new = jnp.maximum(tmp - goe, E - ge)
            if mode in ("full", "nofscan"):
                rh = jnp.max(h, axis=0, keepdims=True)
                row_j = jnp.min(jnp.where(h == rh, rows, jnp.int32(1 << 28)),
                                axis=0, keepdims=True)
                rkey = ((i >> 3) * Lq + row_j) * 8 + (i & 7)
                take = (rh > best) | ((rh == best) & (rkey < bkey))
                best = jnp.where(take, rh, best)
                bkey = jnp.where(take, rkey, bkey)
            elif mode == "norowj":
                rh = jnp.max(h, axis=0, keepdims=True)
                take = rh > best
                best = jnp.where(take, rh, best)
                bkey = jnp.where(take, i + zero[:1], bkey)
            elif mode == "noargmax":
                best = jnp.maximum(best, h[:1])
            return (h, E_new, best, bkey)

        init = (zero, zero, jnp.zeros((1, LANES), jnp.int32),
                jnp.full((1, LANES), jnp.int32(2**31 - 1)))
        H, E, best, bkey = jax.lax.fori_loop(0, Lt, step, init)
        out_score[...] = best + bkey * 0

    return kern


def bench(mode):
    kern = functools.partial(make_kernel(mode), Lq=Lq, Lt=Lt)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.integers(0, 4, (Lq, B)) * 2 + 1, jnp.int32)
    t = jnp.asarray(rng.integers(0, 4, (Lt, B)) * 2 + 1, jnp.int32)

    def one(q, t):
        return pl.pallas_call(
            kern,
            grid=(B // LANES,),
            in_specs=[
                pl.BlockSpec((Lq, LANES), lambda b: (0, b), memory_space=pltpu.VMEM),
                pl.BlockSpec((Lt, LANES), lambda b: (0, b), memory_space=pltpu.VMEM),
            ],
            out_shape=[jax.ShapeDtypeStruct((1, B), jnp.int32)],
            out_specs=[pl.BlockSpec((1, LANES), lambda b: (0, b),
                                    memory_space=pltpu.VMEM)],
        )(q, t)[0]

    @jax.jit
    def chain(q, t):
        acc = jnp.int32(0)
        for k in range(CHAIN):
            acc = acc + one(jnp.roll(q, k, 1), t).sum()
        return acc

    x = chain(q, t); _ = float(x)
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(chain(q, t))
        dt = time.perf_counter() - t0
        g = B * Lq * Lt * CHAIN / dt / 1e9
        best = max(best, g)
    print(f"{mode:10s} {best:8.2f} GCUPS")


for mode in ("full", "norowj", "noargmax", "nofscan"):
    bench(mode)
