"""Web-layer tests: route round-trips through the in-process client.

Mirrors the reference's ``tests/test_ui_controller.py`` and
``tests/test_visualization_integration.py`` (SURVEY.md §4) but runs the REAL
solver engine — no mocked linprog.
"""
import json
import os

import pytest

import simplex_tpu.config as config
from simplex_tpu.services.storage import StorageService
from simplex_tpu.web.app import init_app
from simplex_tpu.web.microweb import TestClient


@pytest.fixture
def client(tmp_path, monkeypatch):
    monkeypatch.setattr(config, "OUTPUT_DIR", str(tmp_path))
    return TestClient(init_app(storage=StorageService(str(tmp_path))))


MAX_FORM = {
    "problem_type": "maximize",
    "objective[]": ["3", "5"],
    "constraint_1[]": ["1", "0", "3"],
    "constraint_2[]": ["0", "2", "2"],
    "constraint_sign[]": ["<=", "<=", "<="],
    "constraint_rhs[]": ["4", "12", "18"],
}


def test_index(client):
    r = client.get("/")
    assert r.status_code == 200
    assert "simplex_tpu" in r.text


def test_new_get_shows_form(client):
    r = client.get("/new")
    assert r.status_code == 200
    assert "objective" in r.text


def test_new_post_previews_and_solve_solves(client):
    r = client.post("/new", data=MAX_FORM)
    assert r.status_code == 200
    assert "Vista previa" in r.text

    r = client.post("/solve")
    assert r.status_code == 200
    assert "Solucion Factible" in r.text
    assert "36.0000" in r.text
    # Visualization container with the SVG widget (2-var problem).
    assert "gilp-container" in r.text
    assert "stx-svg" in r.text
    # Intermediate tableau tables with the pivot-highlight styling.
    assert "Iteración 0 (Tabla Inicial)" in r.text
    assert "background-color:#fff0f0" in r.text


def test_solve_without_session_redirects(client):
    r = client.post("/solve", follow_redirects=True)
    assert "No se encontró ningún problema" in r.text


def test_session_popped_after_solve(client):
    client.post("/new", data=MAX_FORM)
    client.post("/solve")
    r = client.post("/solve", follow_redirects=True)
    assert "No se encontró ningún problema" in r.text


def test_export_pdf_roundtrip(client):
    client.post("/new", data=MAX_FORM)
    client.post("/solve")
    r = client.get("/exportar-pdf")
    assert r.status_code == 200
    assert r.data.startswith(b"%PDF-")
    assert b"Z = 36.0000" in r.data


def test_export_pdf_without_solution_flashes(client):
    r = client.get("/exportar-pdf", follow_redirects=True)
    assert "No se encontró una solución" in r.text


def test_download_and_reload_problem_json(client):
    client.post("/new", data=MAX_FORM)
    client.post("/solve")
    r = client.get("/descargar-problema-json")
    assert r.status_code == 200
    doc = json.loads(r.data)
    assert doc["problema_definicion"]["funcion_objetivo"]["type"] == "maximize"

    r = client.post("/load",
                    files={"problem_file": ("p.json", json.dumps(doc))})
    assert "Vista previa" in r.text
    r = client.post("/solve")
    assert "36.0000" in r.text


def test_load_bounded_problem_solves_through_web(client):
    """Round 4: a JSON upload carrying a ``bounds`` section (the extended
    schema the reference cannot express) solves through /load → /solve
    with the native bounded engine — optimum at BOTH upper bounds."""
    doc = {"problema_definicion": {
        "funcion_objetivo": {"type": "maximize",
                             "coefficients": {"x1": 1.0, "x2": 0.1}},
        "restricciones": [{"coefficients": {"x1": 1.0, "x2": 1.0},
                           "operator": "<=", "rhs": 10.0}],
        "bounds": {"lb": {}, "ub": {"x1": 2.0, "x2": 3.0}},
    }}
    r = client.post("/load",
                    files={"problem_file": ("p.json", json.dumps(doc))})
    assert "Vista previa" in r.text
    r = client.post("/solve")
    assert "2.3000" in r.text          # Z = 1*2 + 0.1*3 at the bounds


def test_load_rejects_garbage(client):
    r = client.post("/load", files={"problem_file": ("x.json", "{oops")},
                    follow_redirects=True)
    assert "inválido" in r.text

    r = client.post("/load",
                    files={"problem_file": ("x.json", json.dumps({"a": 1}))},
                    follow_redirects=True)
    assert "problema_definicion" in r.text


def test_load_validates_structure(client):
    bad = {"problema_definicion": {
        "funcion_objetivo": {"type": "maximize", "coefficients": {"x1": 1.0}},
        "restricciones": [
            {"coefficients": {"x1": 1.0}, "operator": "<<", "rhs": 1.0}
        ],
    }}
    r = client.post("/load",
                    files={"problem_file": ("x.json", json.dumps(bad))},
                    follow_redirects=True)
    assert "operator" in r.text


def test_infeasible_solution_page(client):
    form = {
        "problem_type": "maximize",
        "objective[]": ["1"],
        "constraint_1[]": ["1", "1"],
        "constraint_sign[]": ["<=", ">="],
        "constraint_rhs[]": ["1", "3"],
    }
    client.post("/new", data=form)
    r = client.post("/solve")
    assert "Sin Solucion Factible" in r.text


def test_procesar_formulario_echo(client):
    r = client.post("/procesar_formulario")
    assert r.status_code == 200
    assert json.loads(r.data)["status"] == "ok"


def test_static_css_served(client):
    r = client.get("/static/style.css")
    assert r.status_code == 200
    assert "--accent" in r.text


def test_unknown_route_404(client):
    assert client.get("/nope").status_code == 404


def test_metrics_endpoint_counts_solves(client):
    r = client.get("/metrics")
    assert r.status == 200
    before = json.loads(r.text)["solves"].get("solves", 0)

    client.post("/new", data=MAX_FORM)
    client.post("/solve")
    r = client.get("/metrics")
    data = json.loads(r.text)
    assert data["solves"]["solves"] == before + 1
    assert data["solves"]["optimal"] >= 1


def test_load_mps_upload(client):
    """Additive: /load accepts netlib MPS uploads (expressible LPs)."""
    mps = """NAME T
ROWS
 N  OBJ
 L  R1
 L  R2
COLUMNS
    X1        OBJ         -3.0   R1           1.0
    X2        OBJ         -5.0   R2           2.0
    X1        R2           0.0
RHS
    RHS       R1           4.0   R2          12.0
ENDATA
"""
    r = client.post("/load", files={"problem_file": ("t.mps", mps)})
    assert r.status_code == 200
    r2 = client.post("/solve")
    assert r2.status_code == 200 and "Solucion Factible" in r2.text


def test_load_mps_free_vars_rejected(client):
    mps = """NAME T
ROWS
 N  OBJ
 L  R1
COLUMNS
    X1        OBJ          1.0   R1           1.0
RHS
    RHS       R1           5.0
BOUNDS
 FR BND       X1
ENDATA
"""
    r = client.post("/load", files={"problem_file": ("t.mps", mps)},
                    follow_redirects=True)
    assert r.status_code == 200
    assert "variables libres" in r.text
