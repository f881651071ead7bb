from .simulation import AdvectionSimulation  # noqa: F401
from . import system  # noqa: F401
