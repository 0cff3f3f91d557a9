"""Utilities: FASTA IO, timers, GCUPS counters."""

from genomics_tpu.utils.fasta import read_fasta, write_fasta  # noqa: F401
from genomics_tpu.utils.timers import Timer  # noqa: F401
