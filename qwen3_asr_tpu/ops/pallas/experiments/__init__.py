"""Superseded decode-attention kernel experiments — NOT the shipped path.

Production decode attention is v5 (``..decode_attention_hbm4``) and the
paged variant (``..decode_attention_paged``).  These earlier generations
are kept as *documented experiments* with their measured negative results
(docs/PERFORMANCE.md "Negative results"):

  * ``decode_attention_hbm2`` (v3): whole-batch-element grid cells,
    double-buffered DMA — beaten by v5's dual-granularity blocks.
  * ``decode_attention_hbm3`` (v4): uniform-block tiling; its single block
    size must divide both regions, forcing full-cache reads.
  * ``decode_attention_hbm5`` (v6): lane-grouped slab DMAs (4x fewer
    copies) — measured NEUTRAL vs v5 (1.198 vs 1.137 ms/layer), killing
    the DMA-issue-overhead hypothesis.

They remain importable (env modes "3"/"4" of QWEN3_ASR_DECODE_KERNEL) so
their equivalence tests keep running, but carry no production traffic.
"""
