from .mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    multihost_init,
    replicate_tree,
    replicated,
    shard_batch,
)
