from . import cic  # noqa: F401
