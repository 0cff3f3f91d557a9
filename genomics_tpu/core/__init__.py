from genomics_tpu.core.scoring import AlignmentParams, AlgoType, SemiGlobalSkip  # noqa: F401
from genomics_tpu.core.batch import SeqBatch, PairBatch  # noqa: F401
from genomics_tpu.core import encoding, golds  # noqa: F401
