"""ratatosk_tpu — TPU-native hybrid long-read error correction.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
DecodeGenetics/Ratatosk (reference: /root/reference): a compacted, colored de
Bruijn graph built from accurate short reads corrects noisy ONT long reads via
anchored graph-path beam search scored by a banded edit-distance DP.

See ARCHITECTURE.md for the layer map and design decisions.
"""

import os

import jax

# k-mers are packed into uint64 words (ops/kmers.py); TPU emulates u64 with
# 32-bit pairs, which is fine for the bandwidth-bound k-mer path.
jax.config.update("jax_enable_x64", True)

# TPU compiles go through a remote-compile tunnel in some deployments; a
# persistent cache makes warmup free across runs.
_cache = os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/ratatosk_tpu_jax"))
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

__version__ = "0.1.0"

from ratatosk_tpu.config import CorrectOpt  # noqa: E402,F401
