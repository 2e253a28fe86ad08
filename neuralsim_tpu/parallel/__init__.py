"""Parallelism: device-mesh data-parallel training/rendering (SURVEY.md §2.7)."""
from .mesh import (make_mesh, make_sharded_train_step, make_sharded_render,
                   pad_to_multiple)
from .distributed import (get_rank, get_world_size, global_mesh,
                          host_local_batch_to_global, init_env, is_master)
