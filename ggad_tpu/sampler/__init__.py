from ggad_tpu.sampler.neighbor import NeighborTable, sample_neighbors

__all__ = ["NeighborTable", "sample_neighbors"]
