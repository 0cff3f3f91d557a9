"""Alignment configuration: one dataclass replacing the reference's five
per-app flag styles and compile-time macros.

Defaults mirror GASAL2's `Parameters` (reference:
CDP/GASAL2/src/args_parser.cpp:12-34 — match=1, mismatch=4, gapo=6,
gape=1).  The reference's compile-time `MAX_QUERY_LEN` / `N_CODE` /
`N_PENALTY` macros (CDP/GASAL2/Makefile:1-60) become runtime bucketing
parameters: padded lengths are jit-static per bucket, not compile-time
constants of the library.
"""
from __future__ import annotations

import dataclasses
import enum


class AlgoType(enum.Enum):
    """Alignment algorithms, mirroring GASAL2's algo enum
    (CDP/GASAL2/src/args_parser.h:24-68)."""

    LOCAL = "local"
    GLOBAL = "global"
    SEMI_GLOBAL = "semi_global"
    BANDED = "banded"
    KSW = "ksw"


class SemiGlobalSkip(enum.Flag):
    """Which sequence's overhang is free at HEAD/TAIL (reference:
    semiglobal_kernel_template.h:87-210 template params)."""

    NONE = 0
    QUERY = enum.auto()
    TARGET = enum.auto()
    BOTH = QUERY | TARGET


@dataclasses.dataclass(frozen=True)
class AlignmentParams:
    """Scoring parameters for all DP engines (GASAL2-compatible).

    Penalties are stored positive (as in GASAL2) and subtracted by the
    kernels: substitution score is ``+match`` / ``-mismatch``; opening a
    gap of length k costs ``gap_open + k*gap_extend``.
    """

    match: int = 1
    mismatch: int = 4
    gap_open: int = 6
    gap_extend: int = 1
    # Score a base against 'N' (reference N_PENALTY macro; GASAL2 builds
    # with -N_PENALTY applied to any pairing involving code N_CODE).
    n_penalty: int | None = None
    algo: AlgoType = AlgoType.LOCAL
    head_skip: SemiGlobalSkip = SemiGlobalSkip.NONE
    tail_skip: SemiGlobalSkip = SemiGlobalSkip.NONE
    # ksw-only (reference: ksw_kernel_template.h:46-203)
    zdrop: int = 100
    end_bonus: int = 5
    # banded-only: band width in cells (reference banded.h takes k>>3 tiles)
    band_width: int = 0
    second_best: bool = False
    compute_start: bool = False
    with_traceback: bool = False

    @property
    def gap_oe(self) -> int:
        return self.gap_open + self.gap_extend

    def sub_score(self, equal: bool, either_n: bool = False) -> int:
        if either_n and self.n_penalty is not None:
            return -self.n_penalty
        return self.match if equal else -self.mismatch


# NW app scoring (reference: CDP/NW/common.h:4-7): MATCH=+1, all else -1,
# linear gaps.
NW_APP_MATCH = 1
NW_APP_MISMATCH = -1
NW_APP_INSERTION = -1
NW_APP_DELETION = -1

# SW app scoring (reference: CDP/SW/main.cu:12-15): delta = (x==y)?1:0,
# linear gap -1, floor at 0.
SW_APP_MATCH = 1
SW_APP_MISMATCH = 0
SW_APP_GAP = -1
