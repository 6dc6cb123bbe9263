from .data_parallel import batch_cameras, data_parallel_train_step  # noqa: F401
from .gauss_shard import project_sharded, sh_to_rgb_sharded  # noqa: F401
from .mesh import (  # noqa: F401
    data_sharded,
    enable_async_collectives,
    host_local_to_global,
    init_distributed,
    make_global_mesh,
    make_mesh,
    replicated,
)
from .overlap import phase_split_train_step  # noqa: F401
from .tile_shard import blend_tile_sharded, render_tile_sharded  # noqa: F401
