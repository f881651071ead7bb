from . import euler, reconstruct, riemann, advance  # noqa: F401
