"""Storage, PDF, history, and viz service tests (SURVEY.md §4 mapping of
``test_storage_service.py`` + report-schema checks)."""
import json
import os
import re

import numpy as np
import pytest

import simplex_tpu.config as config
from simplex_tpu import LinearProgram
from simplex_tpu.controllers.orchestrator import (
    SolverOrchestrator,
    solve_problem_dict,
)
from simplex_tpu.services import history as history_svc
from simplex_tpu.services import viz as viz_svc
from simplex_tpu.services.pdf import PdfReportService
from simplex_tpu.services.storage import StorageService


@pytest.fixture
def storage(tmp_path, monkeypatch):
    monkeypatch.setattr(config, "OUTPUT_DIR", str(tmp_path))
    return StorageService(str(tmp_path))


WRAPPER = {"problema_definicion": {
    "funcion_objetivo": {"type": "maximize",
                         "coefficients": {"x1": 3.0, "x2": 5.0}},
    "restricciones": [
        {"coefficients": {"x1": 1.0, "x2": 0.0}, "operator": "<=", "rhs": 4.0},
        {"coefficients": {"x1": 0.0, "x2": 2.0}, "operator": "<=",
         "rhs": 12.0},
        {"coefficients": {"x1": 3.0, "x2": 2.0}, "operator": "<=",
         "rhs": 18.0},
    ]}}


# --------------------------------------------------------------------------- #
# storage                                                                     #
# --------------------------------------------------------------------------- #
def test_sequential_numbering_and_latest_wins(storage):
    p1 = storage.save_json("solucion_", {"v": 1})
    p2 = storage.save_json("solucion_", {"v": 2})
    assert p1.endswith("solucion_1.json")
    assert p2.endswith("solucion_2.json")
    assert storage.load_json("solucion_")["v"] == 2


def test_load_missing_returns_none(storage):
    assert storage.load_solution() is None


def test_save_load_roundtrip_all_prefixes(storage):
    storage.save_objective({"type": "maximize", "coefficients": {"x1": 1.0}})
    storage.save_constraints([{"coefficients": {"x1": 1.0},
                               "operator": "<=", "rhs": 2.0}])
    storage.save_problem(WRAPPER)
    storage.save_solution({"ok": True})
    assert storage.load_objective()["type"] == "maximize"
    assert storage.load_constraints()[0]["rhs"] == 2.0
    assert storage.load_problem() == WRAPPER
    assert storage.load_solution() == {"ok": True}
    assert storage.new_pdf_path().endswith("reporte_solucion_1.pdf")


# --------------------------------------------------------------------------- #
# orchestrator report schema                                                  #
# --------------------------------------------------------------------------- #
def test_report_schema_feasible(storage):
    report = SolverOrchestrator(WRAPPER, storage=storage).run()
    # Reference schema keys all present; "analisis_sensibilidad" is the
    # framework's additive extension (shadow prices + reduced costs).
    assert set(report) == {"problema_definicion", "solucion_encontrada",
                           "visualizacion_gilp_html", "tablas_intermedias",
                           "analisis_sensibilidad"}
    sens = report["analisis_sensibilidad"]
    assert set(sens) == {"precios_sombra", "costos_reducidos"}
    sol = report["solucion_encontrada"]
    assert sol["status"] == "Solucion Factible"
    assert sol["valor_optimo_z"] == pytest.approx(36.0)
    assert sol["valores_variables"]["x1"] == pytest.approx(2.0)
    assert sol["valores_variables"]["x2"] == pytest.approx(6.0)
    # persisted
    assert storage.load_solution()["solucion_encontrada"]["valor_optimo_z"] \
        == pytest.approx(36.0)
    # json-serializable end to end
    json.dumps(report)


def test_report_tables_contract(storage):
    report = SolverOrchestrator(WRAPPER, storage=storage, save=False).run()
    tables = report["tablas_intermedias"]
    assert tables[0]["iteration"] == 0
    assert tables[0]["title"] == "Iteración 0 (Tabla Inicial)"
    assert tables[0]["pivot"] is None
    for t in tables[1:]:
        assert re.match(r"Iteración \d+ \(Pivote: Fila \d+, Col \d+\)",
                        t["title"])
        assert t["pivot"] is not None
    # header row then labeled rows, floats rounded to 4 dp
    head = tables[0]["table"][0]
    assert head[0] == "Base" and head[1] == "C0"
    cell = tables[0]["table"][1][1]
    assert isinstance(cell, float)


def test_report_infeasible(storage):
    wrapper = {"problema_definicion": {
        "funcion_objetivo": {"type": "maximize",
                             "coefficients": {"x1": 1.0}},
        "restricciones": [
            {"coefficients": {"x1": 1.0}, "operator": "<=", "rhs": 1.0},
            {"coefficients": {"x1": 1.0}, "operator": ">=", "rhs": 3.0},
        ]}}
    report = SolverOrchestrator(wrapper, storage=storage, save=False).run()
    sol = report["solucion_encontrada"]
    assert sol["status"] == "Sin Solucion Factible"
    assert sol["valores_variables"] is None
    assert sol["valor_optimo_z"] is None


def test_orchestrator_rejects_empty_wrapper():
    with pytest.raises(ValueError):
        SolverOrchestrator({})


# --------------------------------------------------------------------------- #
# history / viz                                                               #
# --------------------------------------------------------------------------- #
def test_vertex_path_tracks_simplex_walk():
    lp = LinearProgram.from_problem_dict(WRAPPER["problema_definicion"])
    hist = history_svc.compute_pivot_history(lp)
    path = history_svc.vertex_path_from_history(hist, 2)
    assert path[0] == [0.0, 0.0]                 # starts at the origin
    assert path[-1] == pytest.approx([2.0, 6.0])  # ends at the optimum


def test_geometric_view_contains_polygon_and_slider():
    lp = LinearProgram.from_problem_dict(WRAPPER["problema_definicion"])
    html = viz_svc.geometric_view_2d(lp.A, lp.b, lp.ops, lp.c, lp.maximize,
                                     [[0, 0], [2, 6]], lp.variables)
    assert "stx-svg" in html and "stx-slider" in html
    # gilp parity: BOTH sliders — iteration AND objective level (isoprofit
    # line), reference docs/user_guide.md:192-219.
    assert "stx-zslider" in html and "drawIso" in html
    payload = json.loads(html.split("const D = ", 1)[1].split(";\n", 1)[0])
    assert len(payload["vertices"]) >= 3          # feasible-region polygon
    assert payload["path"] == [[0, 0], [2, 6]]
    assert payload["vars"] == ["x1", "x2"]


def test_tableau_html_pivot_highlight():
    table = [["Base", "C0", "C1"], ["F0", 1.0, 2.0], ["F1", 3.0, 4.0]]
    html = viz_svc.tableau_to_html(table, pivot=(0, 1))
    assert "background-color:#fff0f0" in html
    assert "1.0000" in html


# --------------------------------------------------------------------------- #
# pdf                                                                         #
# --------------------------------------------------------------------------- #
def test_pdf_generation_valid_structure(tmp_path, storage):
    report = SolverOrchestrator(WRAPPER, storage=storage, save=False).run()
    path = str(tmp_path / "report.pdf")
    PdfReportService(report, path).generate()
    data = open(path, "rb").read()
    assert data.startswith(b"%PDF-1.4")
    assert data.rstrip().endswith(b"%%EOF")
    # xref offsets point at their objects
    xref_at = int(data[data.rindex(b"startxref"):].split(b"\n")[1])
    assert data[xref_at:xref_at + 4] == b"xref"
    # report content present
    for needle in (b"Reporte de Soluci", b"Z = 36.0000",
                   b"3. An",
                   b"4. Tablas Intermedias"):
        assert needle in data


def test_polytope_3d_unit_cube():
    # x,y,z <= 1 with x,y,z >= 0 -> the unit cube: 8 vertices, 12 edges.
    A = np.eye(3)
    b = np.ones(3)
    ops = np.array([-1, -1, -1])
    verts, edges = viz_svc._feasible_polytope_3d(A, b, ops)
    assert len(verts) == 8
    assert len(edges) == 12
    corners = {tuple(np.round(v, 6)) for v in verts}
    assert (0.0, 0.0, 0.0) in corners and (1.0, 1.0, 1.0) in corners


def test_geometric_view_3d_widget():
    A = np.eye(3)
    b = np.ones(3)
    ops = np.array([-1, -1, -1])
    html = viz_svc.geometric_view_3d(A, b, ops, [1, 1, 1], True,
                                     [[0, 0, 0], [1, 1, 1]],
                                     ["x1", "x2", "x3"])
    assert "stx3-svg" in html and "stx3-slider" in html
    # Objective-level slider (gilp's second slider, now in 3-D too).
    assert "stx3-zslider" in html and "isoprofit PLANE" in html
    payload = json.loads(html.split("const D = ", 1)[1].split(";\n", 1)[0])
    assert len(payload["vertices"]) == 8
    assert payload["path"] == [[0, 0, 0], [1, 1, 1]]
    # Python mirror of the widget's plane-clipping math: a mid-level
    # isoprofit plane through the unit cube must cut >= 3 edges (the JS
    # draws the polygon those points bound).
    verts, edges = payload["vertices"], payload["edges"]
    c = payload["objective"]
    zs = [sum(ci * vi for ci, vi in zip(c, v)) for v in verts]
    lvl = (min(zs) + max(zs)) / 2.0
    cut = 0
    for p, q in edges:
        fp, fq = zs[p] - lvl, zs[q] - lvl
        if (fp < 0) != (fq < 0) and abs(fp - fq) > 1e-12:
            cut += 1
    assert cut >= 3


def test_orchestrator_emits_3d_widget_for_3_vars():
    wrapper = {"problema_definicion": {
        "funcion_objetivo": {"type": "maximize",
                             "coefficients": {"x1": 3.0, "x2": 5.0,
                                              "x3": 4.0}},
        "restricciones": [
            {"coefficients": {"x1": 2.0, "x2": 3.0, "x3": 0.0},
             "operator": "<=", "rhs": 8.0},
            {"coefficients": {"x1": 0.0, "x2": 2.0, "x3": 5.0},
             "operator": "<=", "rhs": 10.0},
            {"coefficients": {"x1": 3.0, "x2": 2.0, "x3": 4.0},
             "operator": "<=", "rhs": 15.0},
        ],
    }}
    report = SolverOrchestrator(wrapper).run()
    assert report["solucion_encontrada"]["status"] == "Solucion Factible"
    assert "stx3-svg" in report["visualizacion_gilp_html"]


# --------------------------------------------------------------------------- #
# history truncation + production-pricing parity                              #
# --------------------------------------------------------------------------- #
def test_history_truncation_is_flagged_and_reported(storage):
    from simplex_tpu.config import SolverConfig

    lp = LinearProgram.from_problem_dict(WRAPPER["problema_definicion"])
    cfg = SolverConfig(max_history=1)      # force the cap below pivot count
    hist = history_svc.compute_pivot_history(lp, cfg)
    assert hist["truncated"] is True
    assert hist["max_steps"] == 1

    report = SolverOrchestrator(WRAPPER, cfg, storage=storage,
                                save=False).run()
    assert report["nota_historial"] == "Historial truncado a 1 pasos."
    assert "Historial truncado" in report["visualizacion_gilp_html"]


def test_history_not_truncated_has_no_note(storage):
    report = SolverOrchestrator(WRAPPER, storage=storage, save=False).run()
    assert "nota_historial" not in report
    hist = history_svc.compute_pivot_history(
        LinearProgram.from_problem_dict(WRAPPER["problema_definicion"]))
    assert hist["truncated"] is False


def test_history_final_objective_matches_production_solve():
    """Devex history must land on the same optimum as the reported solve."""
    from simplex_tpu.models.dense import solve_lp

    lp = LinearProgram.from_problem_dict(WRAPPER["problema_definicion"])
    res = solve_lp(lp)
    hist = history_svc.compute_pivot_history(lp)
    # final tableau's -z cell is the min-form objective
    z_min_hist = -hist["final_tableau"][-1, -1]
    assert res.fun == pytest.approx(z_min_hist, abs=1e-4)
