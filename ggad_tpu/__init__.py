"""ggad_tpu — a TPU-native graph anomaly detection framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of
mala-lab/GGAD (NeurIPS 2024). See SURVEY.md for the reference analysis and
the component traceability matrix.
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA/Mosaic compilation cache: kernel compiles in this
# environment go through a remote tunnel at ~60-90s each; caching them on
# disk makes every repeat run (tests, bench, training) start fast.
# Opt out with GGAD_TPU_NO_CACHE=1.
if not _os.environ.get("GGAD_TPU_NO_CACHE"):
    try:
        import jax as _jax

        _cache = _os.environ.get(
            "GGAD_TPU_CACHE",
            _os.path.expanduser("~/.cache/ggad_tpu_xla"))
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

from ggad_tpu.graph import Graph, from_coo, from_scipy, add_self_loops

__all__ = ["Graph", "from_coo", "from_scipy", "add_self_loops"]
