from .cohort import register_cohort
from .mesh import batch_sharding, make_mesh, volume_sharding

__all__ = ["register_cohort", "make_mesh", "batch_sharding", "volume_sharding"]
