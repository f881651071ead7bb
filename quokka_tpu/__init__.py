"""quokka_tpu: a TPU-native block-structured AMR radiation-hydrodynamics framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of QUOKKA
(quokka-astro/quokka): compressible hydrodynamics (PPM + HLLC + first-order
flux correction + dual energy), two-moment M1 radiation transport with IMEX
matter coupling, block-structured AMR with subcycling and refluxing, Poisson
self-gravity, particles, cooling/chemistry microphysics, `.in`-file
configuration, plotfile/checkpoint I/O.

Design (TPU-first, not a port):
  - state lives in dense fixed-shape jnp arrays ``[nvar, nx, ny, nz]`` per AMR
    level, sharded over a `jax.sharding.Mesh` spanning ICI;
  - every per-cell kernel of the reference (AMReX `ParallelFor` GPU lambdas)
    is a fused XLA stencil or Pallas kernel under `jax.jit` -- never a Python
    loop over cells;
  - halo exchange (AMReX `FillBoundary`) is `shard_map` + `lax.ppermute`;
    reductions (`ParallelDescriptor::Reduce*`) are `lax.psum/pmax`;
  - host Python orchestrates only the O(levels) control flow, exactly as the
    reference's host C++ does.

Double precision is enabled globally at import: the reference
(quokka-astro/quokka) is an all-f64 code and its test tolerances assume it.
Individual simulations may opt into f32/mixed precision via
``precision="single"`` for TPU throughput.
"""

import os as _os

import jax as _jax

_jax.config.update("jax_enable_x64", True)

# persistent compilation cache: TPU compiles of the fused step are expensive
# (~minutes via remote compile); cache them across processes.  The cache dir
# is keyed by the host CPU's feature set: XLA:CPU entries are AOT binaries
# whose target features are frozen at compile time, and reusing them on a
# host with different features (VM migrations) both flips FMA-level rounding
# and can SIGILL/SIGABRT mid-suite (observed: "Loading XLA:CPU AOT result
# ... doesn't match the machine type for execution").
def _host_cache_dir() -> str:
    base = _os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/quokka_jax_cache")
    try:
        import hashlib as _hashlib

        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    tag = _hashlib.sha1(line.encode()).hexdigest()[:10]
                    return f"{base}-{tag}"
    except OSError:
        pass
    return base


try:
    _jax.config.update("jax_compilation_cache_dir", _host_cache_dir())
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # older jax without these options
    pass

from .config import ParmParse  # noqa: E402
from .grid import Grid  # noqa: E402
from .registry import Problem, PhysicsTraits, EOSTraits, HydroTraits  # noqa: E402
from .simulation import Simulation  # noqa: E402

__version__ = "0.1.0"

__all__ = [
    "ParmParse",
    "Grid",
    "Problem",
    "PhysicsTraits",
    "EOSTraits",
    "HydroTraits",
    "Simulation",
]
