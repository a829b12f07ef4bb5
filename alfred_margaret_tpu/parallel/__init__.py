from .shard import DistributedAcEngine, make_mesh

__all__ = ["DistributedAcEngine", "make_mesh"]
