"""ggad_tpu — a TPU-native graph anomaly detection framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of
mala-lab/GGAD (NeurIPS 2024). See SURVEY.md for the reference analysis and
the component traceability matrix.
"""

__version__ = "0.1.0"

from ggad_tpu.graph import Graph, from_coo, from_scipy, add_self_loops

__all__ = ["Graph", "from_coo", "from_scipy", "add_self_loops"]
