"""SW application (reference: CDP/SW): one small fragment aligned to a
large sequence split into overlapping windows; per-window local DP with
match=+1 / mismatch=0 (delta macro), linear gap -1, floor 0; greedy
traceback (M, then I, then D) and a global best-window reduction.

TPU formulation: all windows are batched into ONE device dispatch (the
CDP parent kernel that launched alignKernel<<<nWindows,1>>> becomes a
batch axis, SURVEY.md §2.9), the DP rows stream via lax.scan with the
left-gap chain as a prefix scan, and the (serial, data-dependent)
greedy walk runs on the host over the device-computed H matrix — the
reference also walks the full matrix it kept in global memory
(CDP/SW/main.cu:152-168).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=())
def sw_matrix_batch(x: jnp.ndarray, windows: jnp.ndarray) -> jnp.ndarray:
    """Batched SW app DP.

    x: [n+1] uint8 fragment bytes (index 0.. n-1 used)
    windows: [W, L] uint8 window bytes (padded with 0)
    Returns H: [W, n+1, L+1] int32 full matrices (row i = x pos, col j =
    window pos, both 1-based like the reference's (lenX+1)x(len+1))."""
    W, L = windows.shape
    n = x.shape[0]
    jidx = jnp.arange(L, dtype=jnp.int32)

    def one_row(prev, xc):
        # prev: [W, L+1] row i-1; compute row i
        sub = (windows == xc).astype(jnp.int32)          # [W, L]
        up = prev[:, 1:] - 1
        dia = prev[:, :-1] + sub
        best = jnp.maximum(jnp.maximum(up, dia), 0)
        # left chain: m[j] = max(best[j], m[j-1] - 1) with boundary 0;
        # since best >= 0 the decayed boundary never wins, so
        # m = cummax(best + j) - j exactly
        m = jax.lax.cummax(best + jidx, axis=1) - jidx
        row = jnp.concatenate([jnp.zeros((W, 1), jnp.int32), m], axis=1)
        return row, row

    row0 = jnp.zeros((W, L + 1), jnp.int32)
    _, rows = jax.lax.scan(one_row, row0, x)
    return jnp.concatenate([row0[None], rows], axis=0).transpose(1, 0, 2)


def _greedy_walk(H: np.ndarray, x: bytes, window: bytes, start: int):
    """The reference's traceback (main.cu:152-168): greedy M / I / D."""
    n = len(x)
    length = H.shape[1] - 1
    best = int(H.max(initial=0))
    if best == 0:
        return 0, start + 1, ""
    # row-major first-strict-increase == first cell attaining the max
    flat = int(np.argmax(H == best))
    xc, yc = divmod(flat, H.shape[1])
    cig = []
    while H[xc, yc] > 0 and yc > 0:
        delta = 1 if (xc > 0 and yc > 0 and x[xc - 1] == window[yc - 1]) else 0
        if xc > 0 and yc > 0 and H[xc, yc] == H[xc - 1, yc - 1] + delta:
            cig.append("M")
            xc -= 1
            yc -= 1
        elif xc > 0 and H[xc, yc] == H[xc - 1, yc] - 1:
            cig.append("I")
            xc -= 1
        elif H[xc, yc] == H[xc, yc - 1] - 1:
            cig.append("D")
            yc -= 1
        else:
            break
    return best, yc + start + 1, "".join(cig)


def compress_cigar(cigar: str) -> str:
    """Run-length compression (reference compressCigar, main.cu:76-111)."""
    if not cigar:
        return ""
    out = []
    prev, count = cigar[0], 1
    for c in cigar[1:]:
        if c == prev:
            count += 1
        else:
            out.append(f"{count}{prev}")
            prev, count = c, 1
    out.append(f"{count}{prev}")
    return "".join(out)


def align(
    x: str | bytes,
    y: str | bytes,
    window_size: int | None = None,
    overlap: int | None = None,
):
    """The app driver (main.cu:256-334): window decomposition, batched
    device DP, per-window traceback, global best reduction.

    Returns dict(score, location, window, cigar, cigar_compressed)."""
    if isinstance(x, str):
        x = x.encode()
    if isinstance(y, str):
        y = y.encode()
    lenX, lenY = len(x), len(y)
    overlap = overlap or lenX
    window_size = window_size or 3 * lenX
    n_windows = (lenY + window_size - 1) // window_size
    starts, ends = [], []
    prev_start = 0
    for i in range(n_windows):
        s = 0 if i == 0 else prev_start - overlap + window_size
        prev_start = s
        starts.append(s)
        ends.append(min(s + window_size, lenY))
    L = max(e - s for s, e in zip(starts, ends))
    wins = np.zeros((n_windows, L), np.uint8)
    for i, (s, e) in enumerate(zip(starts, ends)):
        wins[i, : e - s] = np.frombuffer(y[s:e], np.uint8)
    xa = np.frombuffer(x, np.uint8)
    Hd = sw_matrix_batch(jnp.asarray(xa), jnp.asarray(wins))
    # reduce on device, then transfer ONLY the winning window's matrix
    # (the reference's host reduce pulls every window's result; pulling
    # every full H matrix would be O(W·n·L·4) D2H for one walk)
    scores = np.asarray(jnp.max(Hd, axis=(1, 2)))
    if scores.max(initial=0) <= 0:
        return dict(score=0, location=0, window=0, cigar="",
                    cigar_compressed="")
    i = int(np.argmax(scores))     # first window attaining the max (strict >)
    s, e = starts[i], ends[i]
    H = np.asarray(Hd[i])
    sc, loc, cig = _greedy_walk(H[:, : (e - s) + 1], x, y[s:e], s)
    best = dict(score=sc, location=loc, window=i, cigar=cig)
    best["cigar_compressed"] = compress_cigar(best["cigar"])
    return best
