"""Indexing structures — TPU-native counterparts of nvbio's index
modules (reference: CDP/NvB/nvbio/{qgram,fmindex,sufsort}; nvLighter's
Bloom filters):

  qgram     q-gram (seed) index: build + batched lookup
  bloom     blocked Bloom filter with batched insert/query
  fmindex   BWT/FM-index with batched backward search
"""
from genomics_tpu.index.qgram import QGramIndex  # noqa: F401
from genomics_tpu.index.bloom import BloomFilter  # noqa: F401
from genomics_tpu.index.fmindex import FMIndex  # noqa: F401
