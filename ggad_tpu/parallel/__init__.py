from ggad_tpu.parallel.mesh import make_mesh
from ggad_tpu.parallel.full_batch import shard_graph, sharded_train_step

__all__ = ["make_mesh", "shard_graph", "sharded_train_step"]
