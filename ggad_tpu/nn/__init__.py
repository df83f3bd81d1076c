from ggad_tpu.nn.layers import (
    GCNLayer,
    PReLU,
    DenseNoBias,
    MLPHead,
    BilinearDiscriminator,
    readout,
)

__all__ = [
    "GCNLayer",
    "PReLU",
    "DenseNoBias",
    "MLPHead",
    "BilinearDiscriminator",
    "readout",
]
