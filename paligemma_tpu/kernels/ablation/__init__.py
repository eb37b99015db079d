"""Ablation shelf: tested-but-dormant kernels, quarantined from the
production surface.

Nothing in the serving/engine/training paths imports from here. These are
kept because their measurements shaped the production design
(docs/PERFORMANCE.md, docs/ROADMAP.md):

* ``decode_attention`` — standalone Pallas decode-attention kernel;
  superseded by the whole-layer fused kernel (kernels/decode_layer.py).
* ``quant4`` — nibble-packed int4 matmul; blocked by Mosaic int8-shift
  miscompiles in this toolchain (see its docstring).
* ``quant_pallas`` — Pallas int8 dequant matmuls; XLA's fused
  int8->bf16 weight-stream convert matches them without the per-block
  overhead, so production uses the XLA path (kernels/quant.py).
"""
