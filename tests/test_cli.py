"""CLI tests: interactive controllers (mock input, reference
``tests/test_controllers.py`` strategy) + the working solve commands
(which the reference's CLI lacks — its ``app.py`` is dead code,
SURVEY.md §3.5)."""
import json

import pytest

import simplex_tpu.config as config
from simplex_tpu import cli
from simplex_tpu.controllers.cli_io import (
    ConstraintsController,
    ObjectiveFunctionController,
)
from simplex_tpu.services.storage import StorageService


@pytest.fixture
def storage(tmp_path, monkeypatch):
    monkeypatch.setattr(config, "OUTPUT_DIR", str(tmp_path))
    return StorageService(str(tmp_path))


def _scripted(lines):
    it = iter(lines)
    return lambda prompt="": next(it)


def test_objective_controller_retries_until_valid(storage):
    out = []
    ctl = ObjectiveFunctionController(
        storage, input_fn=_scripted(["banana", "max", "oops", "Z = 3x1 - 5x2"]),
        print_fn=out.append)
    data = ctl.run()
    assert data == {"type": "maximize",
                    "coefficients": {"x1": 3.0, "x2": -5.0}}
    assert any("Error" in line for line in out)
    assert storage.load_objective() == data


def test_constraints_controller_full_flow(storage):
    out = []
    ctl = ConstraintsController(
        storage,
        input_fn=_scripted([
            "x1 >= 0",            # rejected: implicit non-negativity
            "2x1 + 3x3 <= 5",     # rejected: unknown variable x3
            "2x1 <= 10",          # accepted, x2 zero-filled
            "x1 + x2 >= 1",       # accepted
            "fin",
        ]),
        print_fn=out.append)
    cons = ctl.run(["x1", "x2"])
    assert len(cons) == 2
    assert cons[0].coefficients == {"x1": 2.0, "x2": 0.0}
    assert any("no-negatividad" in line for line in out)
    assert any("desconocidas" in line for line in out)
    assert storage.load_constraints()[1]["operator"] == ">="


def test_constraints_controller_aborts_without_any(storage):
    ctl = ConstraintsController(storage, input_fn=_scripted(["fin"]),
                                print_fn=lambda s: None)
    assert ctl.run(["x1"]) is None


def test_cli_solve_file(tmp_path, storage, capsys):
    problem = {"problema_definicion": {
        "funcion_objetivo": {"type": "maximize",
                             "coefficients": {"x1": 3.0, "x2": 5.0}},
        "restricciones": [
            {"coefficients": {"x1": 1.0, "x2": 0.0}, "operator": "<=",
             "rhs": 4.0},
            {"coefficients": {"x1": 0.0, "x2": 2.0}, "operator": "<=",
             "rhs": 12.0},
            {"coefficients": {"x1": 3.0, "x2": 2.0}, "operator": "<=",
             "rhs": 18.0},
        ]}}
    path = tmp_path / "problem.json"
    path.write_text(json.dumps(problem))
    rc = cli.main(["solve", str(path)])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Solucion Factible" in out
    assert "x1 = 2.0000" in out
    assert "Z = 36.0000" in out


def test_cli_solve_invalid_file(tmp_path, capsys):
    path = tmp_path / "bad.json"
    path.write_text("{nope")
    assert cli.main(["solve", str(path)]) == 1


def test_cli_solve_latest_and_export_pdf(tmp_path, storage, capsys):
    problem = {"problema_definicion": {
        "funcion_objetivo": {"type": "minimize",
                             "coefficients": {"x1": 2.0, "x2": 3.0}},
        "restricciones": [
            {"coefficients": {"x1": 1.0, "x2": 1.0}, "operator": ">=",
             "rhs": 5.0},
            {"coefficients": {"x1": 2.0, "x2": 1.0}, "operator": ">=",
             "rhs": 8.0},
        ]}}
    storage.save_problem(problem)
    assert cli.main(["solve-latest"]) == 0
    out = capsys.readouterr().out
    # True optimum of this LP is (5, 0), Z=10 (the reference's canned (3,2)
    # mock is not the optimum — see BASELINE.md correctness note).
    assert "Z = 10.0000" in out

    assert cli.main(["export-pdf"]) == 0
    out = capsys.readouterr().out
    assert "reporte_solucion_1.pdf" in out


def test_cli_solve_mps(tmp_path, capsys):
    """CLI solves a netlib-style MPS file with free variables end-to-end."""
    from simplex_tpu.cli import main

    mps = tmp_path / "free.mps"
    mps.write_text("""NAME FREE1
ROWS
 N  COST
 L  CAP
 E  BAL
COLUMNS
    X1        COST         1.0   CAP          1.0
    X2        COST         2.0   BAL          1.0
    X2        CAP          1.0
    X3        COST        -1.0   BAL         -1.0
RHS
    RHS       CAP          8.0   BAL          1.0
BOUNDS
 FR BND       X3
ENDATA
""")
    rc = main(["solve", str(mps)])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Z = " in out and "Estado: 0" in out


def test_cli_solve_mps_engine_choice(tmp_path, capsys):
    from simplex_tpu.cli import main

    mps = tmp_path / "t.mps"
    mps.write_text("""NAME T
ROWS
 N  OBJ
 L  R1
COLUMNS
    X1        OBJ         -1.0   R1           1.0
RHS
    RHS       R1           5.0
ENDATA
""")
    for engine in ("dense", "revised"):
        rc = main(["solve", str(mps), "--engine", engine])
        out = capsys.readouterr().out
        assert rc == 0 and "Z = -5" in out, (engine, out)
