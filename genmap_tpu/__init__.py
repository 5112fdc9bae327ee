"""genmap_tpu — a TPU-native (k,e)-mappability engine.

A from-scratch re-design of the capabilities of GenMap (Pockrandt et al.,
Bioinformatics 2020; reference layout surveyed in SURVEY.md) for TPU hardware:
the genome's BWT lives as bit-packed rank rows in HBM, bidirectional FM-index
extension runs as batched gather+popcount steps, and the optimal-search-scheme
mismatch enumeration (e <= 4) is unrolled into vectorized, branch-free
search-state tensors advanced in lockstep.
"""

__version__ = "0.1.0"

from genmap_tpu.alphabet import encode_seq, decode_seq, revcomp_codes  # noqa: F401
