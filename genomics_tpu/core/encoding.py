"""Sequence encoding: ASCII bases → packed integer codes.

TPU-native replacements for the reference's packing kernels:
- 4-bit code per base (``ord(c) & 0xF``), the GASAL2 convention
  (reference: CDP/GASAL2/src/kernels/pack_rc_seqs.h:13-53 packs 8 ASCII
  bases into one uint32 of 4-bit codes).  We keep one code per uint8 lane
  on TPU — VPU lanes are cheap, and int8 loads vectorize; the packed-word
  form is only materialized for the bit-parallel clustering kernels.
- 2-bit code per base (A=0 C=1 G=2 T=3) packed 32 bases into low/high
  bit-planes of two uint32s (reference: CDP/CLUSTER/func.cu:422-457
  ``compressData``), used by the carry-save-adder match counter.

All host-side helpers are NumPy; device variants are jnp and jit-safe.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# 4-bit GASAL2-style codes: 'A'&15=1, 'C'&15=3, 'G'&15=7, 'T'&15=4, 'N'&15=14
A4, C4, G4, T4, N4 = 1, 3, 7, 4, 14

_COMP4 = np.zeros(16, dtype=np.uint8)
# complement in 4-bit code space: A<->T, C<->G, others -> N
_COMP4[A4], _COMP4[T4] = T4, A4
_COMP4[C4], _COMP4[G4] = G4, C4
_COMP4[N4] = N4

_ASCII_TO_2BIT = np.full(256, 0, dtype=np.uint8)
for _i, _c in enumerate("ACGT"):
    _ASCII_TO_2BIT[ord(_c)] = _i
    _ASCII_TO_2BIT[ord(_c.lower())] = _i


def encode4(seq: str | bytes) -> np.ndarray:
    """ASCII sequence → uint8 array of 4-bit codes (GASAL2 convention)."""
    if isinstance(seq, str):
        seq = seq.encode()
    return np.frombuffer(seq, dtype=np.uint8) & 0xF


def decode4(codes: np.ndarray) -> str:
    """4-bit codes → ASCII (A/C/G/T/N; unknown codes map to N)."""
    lut = np.full(16, ord("N"), dtype=np.uint8)
    lut[A4], lut[C4], lut[G4], lut[T4] = (ord(c) for c in "ACGT")
    return bytes(lut[np.asarray(codes, dtype=np.uint8) & 0xF]).decode()

def complement4(codes: np.ndarray) -> np.ndarray:
    return _COMP4[np.asarray(codes, dtype=np.uint8)]


def reverse_complement4(codes: np.ndarray) -> np.ndarray:
    """Reverse-complement in 4-bit code space.

    Reference: gasal_reversecomplement_kernel
    (CDP/GASAL2/src/kernels/pack_rc_seqs.h:56-212) operates in-place on
    packed words; on TPU this is a cheap vectorized flip + table lookup.
    """
    return _COMP4[np.asarray(codes, dtype=np.uint8)][::-1].copy()


def encode2(seq: str | bytes) -> np.ndarray:
    """ASCII → 2-bit codes (A=0 C=1 G=2 T=3); non-ACGT → 0 (de-gapped
    upstream, matching CLUSTER kernel_baseToNumber semantics,
    reference: CDP/CLUSTER/cluster/src/func.cu:46-77)."""
    if isinstance(seq, str):
        seq = seq.encode()
    return _ASCII_TO_2BIT[np.frombuffer(seq, dtype=np.uint8)]


def pack2_bitplanes(codes2: np.ndarray, pad_to_words: int | None = None):
    """2-bit codes → (low, high) uint32 bit-plane arrays, 32 bases/word.

    Bit b of ``low[w]`` is the low bit of base ``w*32+b``; likewise high.
    Matches CLUSTER ``compressData`` layout (CDP/CLUSTER/func.cu:422-457)
    so the bit-parallel match counter is a pure AND/XNOR/popcount pipeline.
    """
    codes2 = np.asarray(codes2, dtype=np.uint8)
    n = len(codes2)
    nwords = (n + 31) // 32
    if pad_to_words is not None:
        nwords = max(nwords, pad_to_words)
    padded = np.zeros(nwords * 32, dtype=np.uint64)
    padded[:n] = codes2
    bits_lo = (padded & 1).reshape(nwords, 32)
    bits_hi = ((padded >> 1) & 1).reshape(nwords, 32)
    shifts = np.arange(32, dtype=np.uint64)
    low = (bits_lo << shifts).sum(axis=1).astype(np.uint32)
    high = (bits_hi << shifts).sum(axis=1).astype(np.uint32)
    return low, high


# ---- jnp device variants -------------------------------------------------

def jnp_encode4(ascii_u8: jnp.ndarray) -> jnp.ndarray:
    return (ascii_u8 & 0xF).astype(jnp.uint8)


def jnp_reverse_complement4(codes: jnp.ndarray, length: jnp.ndarray) -> jnp.ndarray:
    """Reverse-complement a padded [L] code vector of true length ``length``.

    Keeps the result left-aligned in the padded buffer (jit-safe: uses a
    static-shape roll/gather rather than a dynamic slice).
    """
    L = codes.shape[0]
    comp = jnp.asarray(_COMP4)[codes.astype(jnp.int32)]
    idx = length - 1 - jnp.arange(L)
    idx = jnp.where(idx >= 0, idx, 0)
    out = comp[idx]
    return jnp.where(jnp.arange(L) < length, out, codes).astype(jnp.uint8)
