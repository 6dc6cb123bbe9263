from .data_parallel import batch_cameras, data_parallel_train_step  # noqa: F401
from .gauss_shard import project_sharded, sh_to_rgb_sharded  # noqa: F401
from .mesh import data_sharded, make_mesh, replicated  # noqa: F401
from .tile_shard import blend_tile_sharded, render_tile_sharded  # noqa: F401
