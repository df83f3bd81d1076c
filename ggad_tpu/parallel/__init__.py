from ggad_tpu.parallel.mesh import make_mesh
from ggad_tpu.parallel.full_batch import shard_graph, sharded_train_step
from ggad_tpu.parallel.spmm_shard import (
    build_halo_affinity_subset,
    build_halo_plan,
    build_halo_seed_rows,
    halo_comm_stats,
    affinity_halo,
    affinity_halo_subset,
    partition_edges,
    place_halo_plan,
    place_partition,
    spmm_halo,
    spmm_halo_seed_rows,
)

__all__ = ["make_mesh", "shard_graph", "sharded_train_step",
           "partition_edges", "place_partition", "build_halo_plan",
           "place_halo_plan", "spmm_halo", "affinity_halo",
           "halo_comm_stats", "build_halo_affinity_subset",
           "affinity_halo_subset", "build_halo_seed_rows",
           "spmm_halo_seed_rows"]
