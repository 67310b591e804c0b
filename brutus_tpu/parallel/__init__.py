from .mesh import (  # noqa: F401
    make_mesh, model_sharding, data_sharding, shard_grid, pad_to_multiple,
)
