"""Problem catalog (the de-facto acceptance suite).

Each module defines one or more registered `Problem` subclasses mirroring
the reference's ``src/problems/*`` applications.
"""

from . import (  # noqa: F401
    advection,
    advection2d,
    hydro_suite,
    kelvin_helmholtz,
    leblanc,
    nscbc_channel,
    nscbc_vortex,
    popiii,
    primordial_chem,
    rad_beam,
    rad_dust,
    rad_force,
    rad_line_cooling,
    rad_marshak,
    rad_marshak_asymptotic,
    rad_marshak_cgs,
    rad_marshak_vaytet,
    rad_matter_coupling,
    rad_multigroup,
    rad_pulse,
    rad_streaming,
    rad_suolson,
    rad_tophat,
    rad_tube,
    radhydro_bb,
    radhydro_bench,
    radhydro_pulse,
    radhydro_shell,
    rayleigh_taylor,
    radhydro_shock,
    random_blast,
    sedov,
    shock_cloud,
    shocktube,
    spherical_collapse,
    star_cluster,
)
