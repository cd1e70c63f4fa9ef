from .sharding import make_mesh, sharded_step
