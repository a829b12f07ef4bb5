from .shard import DistributedAcEngine, init_distributed, make_mesh
