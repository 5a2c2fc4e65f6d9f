from .sharding import (make_mesh, replicate, shard_leading, dp_train_step,
                       pp_project, stripe_select, tp_rasterize,
                       tp_train_step)

__all__ = ["make_mesh", "replicate", "shard_leading", "dp_train_step",
           "pp_project", "stripe_select", "tp_rasterize", "tp_train_step"]
