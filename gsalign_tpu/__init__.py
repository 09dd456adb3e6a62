"""gsalign_tpu — a TPU-native whole-genome pairwise alignment framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of GSAlign
(hsinnan75/GSAlign; reference layout surveyed in /root/repo/SURVEY.md):

- FM-index construction on device (prefix-doubling suffix array; replaces the
  incremental BWT-SW builder, reference src/BWT_Index/bwt_gen.c).
- Batched LMEM seeding: thousands of query chunks extend in lock-step through
  vectorized rank/occ queries (replaces the per-thread sequential walk in
  reference src/GSAlign.cpp:51-124 / src/bwt_search.cpp:141-185).
- Diagonal chaining and block repair as vectorized segmented array ops
  (replaces pthread work queues, reference src/GSAlign.cpp:126-471).
- A batched anti-diagonal affine-gap DP kernel (Pallas on TPU, lax.scan
  fallback) with on-device traceback (replaces ksw2 extz2_sse,
  reference src/ksw2_alignment.cpp).
- MAF/ALN/VCF emission with byte parity against the reference formats
  (reference src/tools.cpp, src/SeqVariant.cpp).
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Genome coordinates over fwd+RC text exceed 2^31 for >1 Gbp genomes and the
# prefix-doubling sort uses int64 composite keys; 64-bit must be on globally.
_jax.config.update("jax_enable_x64", True)

# The axon TPU plugin overrides JAX_PLATFORMS from the environment;
# GSALIGN_PLATFORM gives callers (tests, CPU-only runs) a reliable override.
_plat = _os.environ.get("GSALIGN_PLATFORM")
if _plat:
    _jax.config.update("jax_platforms", _plat)

# Remote-TPU compiles are expensive; persist them across processes.
_cache_dir = _os.environ.get("GSALIGN_JIT_CACHE",
                             _os.path.expanduser("~/.cache/gsalign_tpu_jit"))
try:
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:  # older jax without the knobs
    pass

from gsalign_tpu.config import AlignConfig  # noqa: F401,E402
