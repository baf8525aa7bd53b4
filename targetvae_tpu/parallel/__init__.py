from .mesh import make_mesh, batch_sharding, param_shardings  # noqa: F401
from . import distributed  # noqa: F401
