from .mesh import DATA_AXIS, batch_sharding, create_mesh, replicated_sharding

__all__ = ["DATA_AXIS", "batch_sharding", "create_mesh", "replicated_sharding"]
