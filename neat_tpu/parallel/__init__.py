from .mesh import (
    make_mesh,
    place_chunk_inputs,
    ray_sharding,
    replicated_sharding,
    round_chunk_to_mesh,
    shard_scene,
)
