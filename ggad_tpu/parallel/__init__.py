from ggad_tpu.parallel.mesh import make_mesh
from ggad_tpu.parallel.full_batch import shard_graph, sharded_train_step
from ggad_tpu.parallel.spmm_shard import (
    build_halo_plan,
    halo_comm_stats,
    affinity_halo,
    partition_edges,
    place_halo_plan,
    place_partition,
    spmm_halo,
)

__all__ = ["make_mesh", "shard_graph", "sharded_train_step",
           "partition_edges", "place_partition", "build_halo_plan",
           "place_halo_plan", "spmm_halo", "affinity_halo",
           "halo_comm_stats"]
