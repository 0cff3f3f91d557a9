"""DP compute kernels: scan-based JAX engines (portable) and Pallas TPU
kernels (the fast path).  All engines are batched — the TPU-native
replacement for the reference's alignment-per-thread CUDA kernels
(SURVEY.md §2.9: "inter-task" is the primary TPU pattern)."""
