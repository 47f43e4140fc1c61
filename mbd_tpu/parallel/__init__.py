from .mesh import sample_mesh, sample_sharding, replicated_sharding

__all__ = ["sample_mesh", "sample_sharding", "replicated_sharding"]
