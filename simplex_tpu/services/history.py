"""Per-iteration tableau history → report tables (``tablas_intermedias``).

Reproduces the reference's table schema
(``solver_controller.py:322-363``): each entry is

    {"iteration": k,
     "title": "Iteración 0 (Tabla Inicial)" | "Iteración k (Pivote: Fila r, Col c)",
     "table": [[headers...], ["F0", cells...], ...],   # 4-dp rounded floats
     "pivot": (row, col) | None}

where the history itself comes from the device kernel
(``ops/tableau.solve_tableau_history``) instead of the reference's
pure-Python simple_simplex loop (``solver_controller.py:290-319``).
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import jax.numpy as jnp

from ..config import SolverConfig, DEFAULT_CONFIG
from ..core.problem import (LinearProgram, StandardForm,
                            compile_standard_form, lower_bounds_to_rows,
                            split_free_variables)
from ..ops import tableau as tableau_ops


def compute_pivot_history(lp: LinearProgram,
                          config: SolverConfig = DEFAULT_CONFIG,
                          max_steps: Optional[int] = None) -> Dict:
    """Run the history-capturing solve; returns dict with raw snapshots.

    History capture is a presentation feature for small problems (the
    reference's Plan-B tableau display); the tableau snapshots are cropped
    to real rows/columns before being returned.  Finite variable bounds
    display as explicit bound rows (the tableau is the pedagogical object
    here — the row form is what a textbook two-phase tableau shows);
    free variables display through the x = x+ - x- split columns.
    """
    lp = split_free_variables(lower_bounds_to_rows(lp))[0]
    sf = compile_standard_form(lp)
    steps = int(max_steps or config.max_history)
    # Same pricing (devex/dantzig + stall-gated Bland) and the same phase-1
    # feasibility threshold as the production solve_tableau call, so the
    # recorded pivot sequence is the path the reported solve actually took.
    T, basis, status, snaps, pivots, valid = tableau_ops.solve_tableau_history(
        jnp.asarray(sf.tableau),
        jnp.asarray(sf.basis),
        jnp.asarray(sf.col_mask_p1),
        jnp.asarray(sf.col_mask_p2),
        jnp.asarray(sf.obj_row_p2),
        need_phase1=sf.need_phase1,
        tol=max(config.tol, 1e-6),
        max_steps=steps,
        bland_after=int(config.bland_after),
        devex=config.pivot_rule == "devex",
    )
    snaps = np.asarray(snaps)
    pivots = np.asarray(pivots)
    valid = np.asarray(valid)

    m, nc, npad = sf.n_rows, sf.n_cols, sf.n_pad
    live = [k for k in range(snaps.shape[0]) if valid[k]]

    # Crop each snapshot to [real constraint rows + objective row] x
    # [real columns + RHS].
    def crop(Tk):
        rows = np.concatenate([Tk[:m], Tk[-1:]], axis=0)
        return np.concatenate([rows[:, :nc], rows[:, npad:npad + 1]], axis=1)

    entries = []
    # Step 0: the initial tableau, pivot indices None (reference contract:
    # ``solver_controller.py:347-350``).
    entries.append({"step": 0, "tableau": crop(snaps[0] if len(snaps) else
                                               np.asarray(sf.tableau)),
                    "pivot": None})
    for i, k in enumerate(live):
        r, s = int(pivots[k, 0]), int(pivots[k, 1])
        nxt = snaps[k + 1] if k + 1 < snaps.shape[0] else np.asarray(T)
        entries.append({"step": i + 1, "tableau": crop(nxt),
                        "pivot": (r if r < m else m, s if s < nc else nc)})
        # note: entry i's tableau is the state AFTER pivot i, while the
        # pivot recorded is the one APPLIED to the previous state — the
        # same convention simple_simplex emits.

    from ..core.problem import STATUS_ITERATION_LIMIT

    return {
        "status": int(status),
        # The scan cap was hit before a verdict: the displayed tables are a
        # silent prefix of the real pivot sequence unless flagged.
        "truncated": int(status) == STATUS_ITERATION_LIMIT,
        "max_steps": steps,
        "entries": entries,
        "n_rows": m,
        "n_cols": nc,
        "final_tableau": crop(np.asarray(T)),
    }


def history_to_tables(history: Dict) -> List[Dict]:
    """Convert raw history entries into the report's table schema."""
    out = []
    for e in history["entries"]:
        step = e["step"]
        pivot = e["pivot"]
        tab = e["tableau"]
        num_cols = tab.shape[1]
        headers = ["Base"] + [f"C{i}" for i in range(num_cols)]
        if step == 0 or pivot is None:
            title = "Iteración 0 (Tabla Inicial)"
        else:
            title = f"Iteración {step} (Pivote: Fila {pivot[0]}, Col {pivot[1]})"
        rows = [headers]
        for i in range(tab.shape[0]):
            rows.append([f"F{i}"] + [round(float(v), 4) for v in tab[i]])
        out.append({
            "iteration": step,
            "title": title,
            "table": rows,
            "pivot": tuple(pivot) if pivot is not None else None,
        })
    return out


def vertex_path_from_history(history: Dict, n_vars: int) -> List[List[float]]:
    """Decision-variable values at each recorded iteration (for the 2-D
    geometric widget's vertex path).

    A decision variable is basic in a snapshot iff its column is a unit
    vector; its value is then that row's RHS.
    """
    path = []
    for e in history["entries"]:
        tab = e["tableau"]          # (m+1, nc+1) cropped
        rows, rhs = tab[:-1, :], tab[:-1, -1]
        x = []
        for j in range(min(n_vars, tab.shape[1] - 1)):
            col = rows[:, j]
            ones = np.isclose(col, 1.0, atol=1e-5)
            if ones.sum() == 1 and np.allclose(col[~ones], 0.0, atol=1e-5):
                x.append(float(rhs[np.argmax(ones)]))
            else:
                x.append(0.0)
        path.append([max(v, 0.0) for v in x])
    return path
