"""Research-only kernels: MEASURED DEAD ENDS kept for the record.

Nothing in this package is on a default code path. The contents are
working, parity-tested Pallas implementations that LOST to XLA on the
target runtime (PERF.md round 2):

- ``pallas_unet2d``: per-block fused UNet2D forward (~40 kernels/eval) —
  29.7 ms/fwd inside the sampling scan vs 8.8 ms for the XLA forward
  (per-pallas_call fixed cost ~0.7 ms dominates).
- ``pallas_unet2d_mega``: whole-forward weight-streaming mega-kernel —
  interpret-mode parity passes, but Mosaic compilation does not finish.

They are retained as kernel-lowering regression coverage and as the
falsification record for the dispatch-ceiling analysis. Selecting them
from user-facing tools (``--impl pallas``) emits an explicit warning.
"""
