"""App-level engines — TPU-native counterparts of the reference's seven
CUDA applications (SURVEY.md §2):

  nw        Needleman–Wunsch demo app (CDP/NW)
  sw        windowed Smith–Waterman with greedy CIGAR (CDP/SW)
  aligner   GASAL2-class batched alignment library (runtime.AlignEngine
            + gasal_compat facade)
  pairhmm   GATK-style PairHMM likelihood engine (Non-CDP/PairHMM)
  msa       center-star multiple sequence alignment (CDP/STAR)
  cluster   greedy read clustering (CDP/CLUSTER)
  ngia      distributed clustering over a device mesh (nGIA)
"""
