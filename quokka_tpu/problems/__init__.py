"""Problem catalog (the de-facto acceptance suite).

Each module defines one or more registered `Problem` subclasses mirroring
the reference's ``src/problems/*`` applications.
"""

from . import sedov, shocktube  # noqa: F401
