from .mesh import make_mesh, ray_sharding, replicated_sharding, shard_scene
