"""LEAN divergence mode (large-domain path) vs the classic formulation.

The lean path (`hydro/advance.py::_advance_hydro_rk2_lean`) has the sweep
kernels emit ONLY accumulated divergence totals -- no face arrays in HBM,
which is what lets 512^3-class domains fit one chip. Its flux values and
FOFC blend decisions are the same IEEE sequences as the classic path; the
permitted difference is the divergence/average association (classic takes
the divergence of the time-averaged flux, lean averages the divergences)
plus FMA-contraction freedom. So agreement is to a few ulps over one
step, FOFC counts match, and conservation telescopes exactly.
"""

import dataclasses

import numpy as np
import pytest

from quokka_tpu.indices import EGAS, RHO

from test_fused_update import _paths, _ulp_close
from test_ghostfree import BCS, _make_state, _opts


@pytest.fixture(autouse=True)
def _force_lean(monkeypatch):
    monkeypatch.setenv("QUOKKA_PALLAS_LEAN", "1")


def _close_outliers(a, b, rtol, ulp_of_max, frac=0.005, big_frac=0.02):
    """`_ulp_close` that tolerates a bounded set of discrete-branch flips:
    the lean association change (averaging divergences instead of dividing
    the averaged flux) moves try-states by ulps, and the dual-energy sync
    / floor / FOFC-validity tests are step functions of those states --
    cells sitting exactly on a threshold legitimately flip branches. The
    flips must stay rare (<= `frac` of cells per component) and bounded
    (|a-b| <= `big_frac` * the component's global magnitude)."""
    from quokka_tpu.indices import EINT as _EINT

    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    fin = np.isfinite(b)
    np.testing.assert_array_equal(np.isfinite(a), fin)
    np.testing.assert_array_equal(a[~fin], b[~fin])
    for c in range(a.shape[0]):
        m = fin[c]
        scale = np.max(np.abs(b[c][m]), initial=0.0)
        atol = ulp_of_max * np.spacing(scale)
        bad = ~np.isclose(a[c][m], b[c][m], rtol=rtol, atol=atol)
        # the AUXILIARY internal energy is the most branch-exposed field
        # (PdV central-difference substitution + dual-energy sync are both
        # step functions of the redo mask neighborhood) -- with ~10% of
        # this contrived box FOFC-flagged it flips on more cells, all
        # magnitude-bounded below
        f = frac * (10 if c == _EINT else 1)
        assert bad.sum() <= max(1, int(f * m.sum())), (
            f"component {c}: {bad.sum()} outliers of {m.sum()}"
        )
        diff = np.abs(a[c][m] - b[c][m])[bad]
        bf = big_frac * (3 if c == _EINT else 1)
        assert np.all(diff <= bf * max(scale, 1.0)), (
            f"component {c}: outlier magnitude {diff.max()} vs scale {scale}"
        )


@pytest.mark.parametrize("bc_name", sorted(BCS))
@pytest.mark.parametrize("rough", [False, True])
def test_lean_matches_classic(bc_name, rough, monkeypatch):
    n = 16
    bcs = BCS[bc_name]
    U = _make_state((n, n, n), seed=3, rough=rough)
    opts_l = dataclasses.replace(_opts(n), fuse_update=True)
    opts_c = dataclasses.replace(opts_l, fuse_update=False)
    dt = 0.2 / n
    run = _paths(n, bcs, U, opts_l, dt)

    for gf in (False, True):
        U_l, st_l = run(opts_l, gf)  # lean (env-forced)
        monkeypatch.setenv("QUOKKA_PALLAS_LEAN", "0")
        U_c, st_c = run(opts_c, gf)  # classic XLA flux formulation
        monkeypatch.setenv("QUOKKA_PALLAS_LEAN", "1")
        # stage-1 try states differ only by contraction/association, so
        # the FOFC trigger masks (inf/nan/floor checks) must agree
        assert int(st_l["n_fofc"]) == int(st_c["n_fofc"])
        if rough:
            assert int(st_l["n_fofc"]) > 0, "rough state must exercise FOFC"
            # the contrived rough state FOFC-flags ~10% of the box; cells
            # on dual-energy/floor thresholds may flip discrete branches
            _close_outliers(U_l, U_c, rtol=3e-5, ulp_of_max=256)
        else:
            _ulp_close(U_l, U_c, rtol=3e-5, ulp_of_max=256)


def test_lean_ghostfree_matches_lean_padded():
    n = 16
    bcs = BCS["mixed"]
    U = _make_state((n, n, n), seed=7)
    opts = dataclasses.replace(_opts(n), fuse_update=True)
    dt = 0.2 / n
    run = _paths(n, bcs, U, opts, dt)
    U_pad, _ = run(opts, False)
    U_gf, _ = run(opts, True)
    _ulp_close(U_pad, U_gf, rtol=3e-5, ulp_of_max=256)


def test_lean_conserves():
    """Periodic box: averaged divergences telescope -- total mass,
    momentum, and energy preserved to accumulation roundoff."""
    n = 16
    from quokka_tpu.registry import BC_PERIODIC, BCSpec

    bcs = BCSpec(
        x=(BC_PERIODIC, BC_PERIODIC),
        y=(BC_PERIODIC, BC_PERIODIC),
        z=(BC_PERIODIC, BC_PERIODIC),
    )
    U = _make_state((n, n, n), seed=11)
    opts = dataclasses.replace(_opts(n), fuse_update=True)
    dt = 0.2 / n
    run = _paths(n, bcs, U, opts, dt)
    U_new, _ = run(opts, True)
    s0 = np.sum(np.asarray(U, np.float64), axis=(1, 2, 3))
    s1 = np.sum(np.asarray(U_new, np.float64), axis=(1, 2, 3))
    for c in (RHO, 1, 2, 3, EGAS):
        assert abs(s1[c] - s0[c]) <= 1e-3 * max(abs(s0[c]), 1.0), (
            c, s0[c], s1[c],
        )


def test_lean_sweep_chunked_bitwise():
    """In-kernel sweep chunking is pure data movement: the lean step with
    forced tiny chunks must equal the unchunked lean step BIT-FOR-BIT."""
    import subprocess
    import sys
    import textwrap

    prog = textwrap.dedent(
        """
        import dataclasses, os, sys
        import numpy as np
        sys.path.insert(0, "tests")
        from test_fused_update import _paths
        from test_ghostfree import BCS, _make_state, _opts
        n = 16
        bcs = BCS["mixed"]
        U = _make_state((n, n, n), seed=5, rough=True)
        opts = dataclasses.replace(_opts(n), fuse_update=True)
        run = _paths(n, bcs, U, opts, 0.2 / n)
        U1, st = run(opts, True)
        np.save(sys.argv[1], np.asarray(U1))
        """
    )
    import tempfile

    outs = []
    with tempfile.TemporaryDirectory() as td:
        for tag, chunk in (("whole", "0"), ("tiny", "8")):
            env = dict(
                __import__("os").environ,
                QUOKKA_PALLAS_LEAN="1",
                QUOKKA_PALLAS_SWEEP_CHUNK=chunk,
                JAX_PLATFORMS="cpu",
            )
            path = f"{td}/{tag}.npy"
            subprocess.run(
                [sys.executable, "-c", prog, path], check=True, env=env,
                cwd=".",
            )
            outs.append(np.load(path))
    np.testing.assert_array_equal(outs[0], outs[1])
