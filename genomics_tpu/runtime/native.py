"""ctypes loader for the native runtime library (native/cigar.cpp).

Builds lazily via make on first use (g++ is baked into the image;
pybind11 is not, hence plain C ABI + ctypes).  Falls back to the pure
Python decoder (golds.decode_tb) if the build fails."""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libgenomics_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            srcs = [os.path.join(_NATIVE_DIR, f)
                    for f in ("cigar.cpp", "sais.cpp", "lighter.cpp")]
            if not os.path.exists(_SO_PATH) or any(
                os.path.getmtime(_SO_PATH) < os.path.getmtime(f) for f in srcs
            ):
                subprocess.run(
                    ["make", "-s"], cwd=_NATIVE_DIR, check=True,
                    capture_output=True, timeout=120,
                )
            lib = ctypes.CDLL(_SO_PATH)
            lib.gt_decode_tb_batch.argtypes = [
                ctypes.POINTER(ctypes.c_int32),  # packed
                ctypes.c_int, ctypes.c_int, ctypes.c_int,  # B, Lt, Lq8
                ctypes.POINTER(ctypes.c_int32),  # qlen
                ctypes.POINTER(ctypes.c_int32),  # tlen
                ctypes.POINTER(ctypes.c_int32),  # score
                ctypes.POINTER(ctypes.c_int32),  # qend
                ctypes.POINTER(ctypes.c_int32),  # tend
                ctypes.c_int,                    # algo
                ctypes.c_int,                    # flags (semiglobal heads)
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8),  # cigars
                ctypes.c_int,                    # max_ops
                ctypes.POINTER(ctypes.c_int32),  # n_ops
                ctypes.POINTER(ctypes.c_int32),  # qstart
                ctypes.POINTER(ctypes.c_int32),  # tstart
            ]
            lib.gt_sais_u8.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int32),
            ]
            lib.gt_sais_u8.restype = ctypes.c_int
            lib.gt_bwt_from_sa.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_uint8),
            ]
            lib.gt_bwt_from_sa.restype = ctypes.c_int
            lib.gt_sais_u8_64.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
            ]
            lib.gt_sais_u8_64.restype = ctypes.c_int
            lib.gt_bwt_from_sa_64.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_uint8),
            ]
            lib.gt_bwt_from_sa_64.restype = ctypes.c_int
            lib.gt_lighter_pass3.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),   # codes [N, L]
                ctypes.POINTER(ctypes.c_int32),   # lens
                ctypes.c_int, ctypes.c_int,       # n_reads, max_len
                ctypes.c_void_p,                  # quals or NULL
                ctypes.POINTER(ctypes.c_uint32),  # bloom words
                ctypes.c_uint64, ctypes.c_int,    # n_bits, bloom_k
                ctypes.c_int, ctypes.c_double,    # K, max_correction
                ctypes.c_int,                     # bad_quality
                ctypes.POINTER(ctypes.c_uint8),   # out codes
                ctypes.POINTER(ctypes.c_int32),   # out n_corrections
            ]
            lib.gt_lighter_pass3.restype = ctypes.c_int
            lib.gt_decode_tb_batch_strided.argtypes = (
                [ctypes.POINTER(ctypes.c_int32),
                 ctypes.c_int64, ctypes.c_int64, ctypes.c_int64]
                + list(lib.gt_decode_tb_batch.argtypes[1:])
            )
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def decode_tb_batch(
    packed: np.ndarray,   # [B, Lt//8, Lq] int32 packed nibbles (8 target rows/word)
    qlen: np.ndarray,
    tlen: np.ndarray,
    algo: str,
    params,
    score: np.ndarray | None = None,
    qend: np.ndarray | None = None,
    tend: np.ndarray | None = None,
    max_ops: int | None = None,
    head_q: bool = False,
    head_t: bool = False,
    layout: str = "bsq",
):
    """Batched CIGAR decode.  Returns (cigars [B, max_ops] u8, n_ops,
    qstart, tstart).  Uses the C++ decoder when available, else the
    Python gold (bit-identical).  algo: "local" | "global" |
    "semiglobal" (extension — see golds.decode_tb; qend/tend must be
    the caller-resolved end cell, head_q/head_t the HEAD skip flags).

    layout: "bsq" = packed [B, Lt8, Lq]; "sqb" = packed [Lt8, Lq, B] —
    the Pallas TB kernel's natural HBM layout, walked via strides so
    the device never pays a relayout transpose."""
    packed = np.ascontiguousarray(packed, np.int32)
    if layout == "sqb":
        Lt8, Lq, B = packed.shape
        strides = (1, Lq * B, B)
    else:
        B, Lt8, Lq = packed.shape
        strides = (Lt8 * Lq, Lq, 1)
    Lt = Lt8 * 8
    max_ops = max_ops or (Lq + Lt + 8)
    qlen = np.ascontiguousarray(qlen, np.int32)
    tlen = np.ascontiguousarray(tlen, np.int32)
    a = {"local": 0, "global": 1, "semiglobal": 2}[algo]
    flags = (1 if head_q else 0) | (2 if head_t else 0)
    score = np.ascontiguousarray(
        score if score is not None else np.zeros(B), np.int32
    )
    qend = np.ascontiguousarray(qend if qend is not None else np.zeros(B), np.int32)
    tend = np.ascontiguousarray(tend if tend is not None else np.zeros(B), np.int32)

    lib = _load()
    if lib is not None:
        cigars = np.zeros((B, max_ops), np.uint8)
        n_ops = np.zeros(B, np.int32)
        qstart = np.zeros(B, np.int32)
        tstart = np.zeros(B, np.int32)
        lib.gt_decode_tb_batch_strided(
            _ptr(packed, ctypes.c_int32),
            ctypes.c_int64(strides[0]), ctypes.c_int64(strides[1]),
            ctypes.c_int64(strides[2]), B, Lt8, Lq,
            _ptr(qlen, ctypes.c_int32), _ptr(tlen, ctypes.c_int32),
            _ptr(score, ctypes.c_int32), _ptr(qend, ctypes.c_int32),
            _ptr(tend, ctypes.c_int32), a, flags,
            int(params.match), int(params.mismatch),
            int(params.gap_oe), int(params.gap_extend),
            _ptr(cigars, ctypes.c_uint8), max_ops,
            _ptr(n_ops, ctypes.c_int32),
            _ptr(qstart, ctypes.c_int32), _ptr(tstart, ctypes.c_int32),
        )
        return cigars, n_ops, qstart, tstart

    # Python fallback via the gold decoder
    from genomics_tpu.core import golds
    from genomics_tpu.ops.pallas_align import unpack_tb_nibbles

    if layout == "sqb":
        packed = np.ascontiguousarray(packed.transpose(2, 0, 1))
    nibs = unpack_tb_nibbles(packed)  # [B, Lt, Lq]
    cigars = np.zeros((B, max_ops), np.uint8)
    n_ops = np.zeros(B, np.int32)
    qstart = np.zeros(B, np.int32)
    tstart = np.zeros(B, np.int32)
    for b in range(B):
        d = golds.decode_tb(
            nibs[b], int(qlen[b]), int(tlen[b]), algo, params,
            int(score[b]), int(qend[b]), int(tend[b]),
            head_q=head_q, head_t=head_t,
        )
        k = min(len(d["cigar"]), max_ops)
        cigars[b, :k] = d["cigar"][:k]
        n_ops[b] = d["n_ops"]
        qstart[b] = d["query_start"]
        tstart[b] = d["target_start"]
    return cigars, n_ops, qstart, tstart


def lighter_pass3(codes: np.ndarray, lens: np.ndarray,
                  bloom_words: np.ndarray, n_bits: int, bloom_k: int,
                  K: int, max_correction: float, bad_quality: int,
                  quals: np.ndarray | None = None):
    """Batched Lighter pass-3 walk (native/lighter.cpp — OpenMP across
    reads).  codes: [N, L] 2-bit with 4 = N.  Returns (out_codes,
    n_corrections) or None when the native library is unavailable or
    the read length exceeds the native stack buffers."""
    lib = _load()
    if lib is None or codes.shape[1] > 4096:
        return None
    codes = np.ascontiguousarray(codes, np.uint8)
    lens = np.ascontiguousarray(lens, np.int32)
    bloom_words = np.ascontiguousarray(bloom_words, np.uint32)
    n, L = codes.shape
    out = np.empty_like(codes)
    ncorr = np.empty(n, np.int32)
    qp = None
    if quals is not None:
        quals = np.ascontiguousarray(quals, np.uint8)
        qp = quals.ctypes.data_as(ctypes.c_void_p)
    lib.gt_lighter_pass3(
        _ptr(codes, ctypes.c_uint8), _ptr(lens, ctypes.c_int32), n, L,
        qp, _ptr(bloom_words, ctypes.c_uint32),
        ctypes.c_uint64(n_bits), bloom_k, K,
        ctypes.c_double(max_correction), bad_quality,
        _ptr(out, ctypes.c_uint8), _ptr(ncorr, ctypes.c_int32),
    )
    return out, ncorr


# texts longer than this take the int64 SA-IS (the int32 path needs
# n + 1 < 2^31; the margin below keeps the recursion's n1 names safe too)
_SAIS32_MAX = (1 << 31) - 16


def sais_u8(text: np.ndarray, force64: bool = False) -> np.ndarray | None:
    """Linear-time suffix array of a uint8 text via native SA-IS
    (native/sais.cpp — the nvbio/sufsort replacement; nvBWT's
    human-genome workload).  Returns the (n+1)-entry SA including the
    appended sentinel at index 0 — int32 below ~2.1 G symbols, int64
    above (genome scale; force64 exercises that path on small texts
    for parity tests) — or None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    text = np.ascontiguousarray(text, np.uint8)
    n = len(text)
    if force64 or n >= _SAIS32_MAX:
        sa = np.empty(n + 1, np.int64)
        rc = lib.gt_sais_u8_64(
            _ptr(text, ctypes.c_uint8), ctypes.c_int64(n),
            _ptr(sa, ctypes.c_int64))
        return sa if rc == 0 else None
    sa = np.empty(n + 1, np.int32)
    rc = lib.gt_sais_u8(_ptr(text, ctypes.c_uint8), n, _ptr(sa, ctypes.c_int32))
    return sa if rc == 0 else None


def bwt_from_sa(text: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """BWT bytes from text + its (n+1)-entry SA (0xFF at the sentinel).
    Accepts int32 or int64 SAs (the genome-scale path)."""
    lib = _load()
    text = np.ascontiguousarray(text, np.uint8)
    n = len(text)
    out = np.empty(n + 1, np.uint8)
    if lib is not None:
        if sa.dtype == np.int64:
            sa = np.ascontiguousarray(sa, np.int64)
            lib.gt_bwt_from_sa_64(
                _ptr(text, ctypes.c_uint8), ctypes.c_int64(n),
                _ptr(sa, ctypes.c_int64), _ptr(out, ctypes.c_uint8))
        else:
            sa = np.ascontiguousarray(sa, np.int32)
            lib.gt_bwt_from_sa(
                _ptr(text, ctypes.c_uint8), n,
                _ptr(sa, ctypes.c_int32), _ptr(out, ctypes.c_uint8))
        return out
    sa64 = sa.astype(np.int64)
    out[:] = np.where(sa64 == 0, 0xFF, text[np.maximum(sa64 - 1, 0)])
    return out
