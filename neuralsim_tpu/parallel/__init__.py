"""Parallelism: device-mesh data-parallel training/rendering (SURVEY.md §2.7)."""
from .mesh import (make_mesh, make_sharded_train_step, make_sharded_render,
                   pad_to_multiple)
