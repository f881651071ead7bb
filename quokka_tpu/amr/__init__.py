from . import operators  # noqa: F401
from .hierarchy import AMRSimulation  # noqa: F401
