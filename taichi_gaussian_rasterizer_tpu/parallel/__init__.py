from .sharding import (assemble_stripes, balance_stripe_rows, dp_train_step,
                       make_mesh, pp_project, replicate, shard_leading,
                       stripe_row_loads, stripe_select, tp_rasterize,
                       tp_train_step)

__all__ = ["assemble_stripes", "balance_stripe_rows", "make_mesh",
           "replicate", "shard_leading", "dp_train_step", "pp_project",
           "stripe_row_loads", "stripe_select", "tp_rasterize",
           "tp_train_step"]
