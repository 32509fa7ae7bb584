from .mesh import make_mesh, batch_sharding, replicated_sharding
from .train_step import make_train_step, make_eval_step, init_train_state

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "make_train_step",
    "make_eval_step",
    "init_train_state",
]
