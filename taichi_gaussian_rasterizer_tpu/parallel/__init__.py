from .sharding import (make_mesh, replicate, shard_leading, dp_train_step,
                       pp_project, tp_rasterize)

__all__ = ["make_mesh", "replicate", "shard_leading", "dp_train_step",
           "pp_project", "tp_rasterize"]
