from .mesh import (
    distributed_init,
    is_main_process,
    make_mesh,
    replicate,
    shard_batch,
)
from .tp import fsdp_spec, shard_state
