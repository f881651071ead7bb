from . import poisson  # noqa: F401
