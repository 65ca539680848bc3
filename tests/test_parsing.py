"""Unit tests for expression parsing — mirrors the reference's pure-unit
parser suites (tests/test_objective_function.py and tests/test_constraints.py
in the reference; see SURVEY.md §4)."""
import pytest

from simplex_tpu.core.parsing import (
    Constraint,
    ConstraintsParser,
    ConstraintsValidator,
    ObjectiveFunctionParser,
    variable_order,
)


# --------------------------- objective parser --------------------------- #
class TestObjectiveFunctionParser:
    def test_basic(self):
        assert ObjectiveFunctionParser.parse("Z = 3x1 - 5x2 + 0x3") == {
            "x1": 3.0, "x2": -5.0, "x3": 0.0,
        }

    def test_without_z_prefix(self):
        assert ObjectiveFunctionParser.parse("2x1 + 4x2") == {"x1": 2.0, "x2": 4.0}

    def test_decimal_and_star(self):
        assert ObjectiveFunctionParser.parse("Z = 2.5*x1 + 1x2") == {
            "x1": 2.5, "x2": 1.0,
        }

    def test_negative_first_term(self):
        assert ObjectiveFunctionParser.parse("-2x1 + 3x2") == {"x1": -2.0, "x2": 3.0}

    def test_empty_raises(self):
        with pytest.raises(ValueError, match="vacía"):
            ObjectiveFunctionParser.parse("   ")

    def test_garbage_raises(self):
        with pytest.raises(ValueError, match="Formato inválido"):
            ObjectiveFunctionParser.parse("hello world")

    def test_must_start_at_x1(self):
        with pytest.raises(ValueError, match="comenzar en x1"):
            ObjectiveFunctionParser.parse("3x2 + 4x3")

    def test_must_be_consecutive(self):
        with pytest.raises(ValueError, match="consecutivas"):
            ObjectiveFunctionParser.parse("3x1 + 4x3")

    def test_bare_variable_rejected(self):
        # Objective terms require an explicit numeric coefficient.
        with pytest.raises(ValueError):
            ObjectiveFunctionParser.parse("x1 + x2")


# --------------------------- constraints parser ------------------------- #
VALID_CONSTRAINTS = [
    ("2x1 + 3x2 <= 10", {"x1": 2.0, "x2": 3.0}, "<=", 10.0),
    ("2x1 - 3x2 >= -4", {"x1": 2.0, "x2": -3.0}, ">=", -4.0),
    ("x1 + x2 = 5", {"x1": 1.0, "x2": 1.0}, "=", 5.0),
    ("-x1 + 2.5x2 <= 0", {"x1": -1.0, "x2": 2.5}, "<=", 0.0),
    ("2*x1+3*x2<=12", {"x1": 2.0, "x2": 3.0}, "<=", 12.0),
    (".5x1 <= 3", {"x1": 0.5}, "<=", 3.0),
    ("-0.0x1 + x2 >= 1", {"x1": -0.0, "x2": 1.0}, ">=", 1.0),
]


@pytest.mark.parametrize("expr,coeffs,op,rhs", VALID_CONSTRAINTS)
def test_constraint_valid(expr, coeffs, op, rhs):
    con = ConstraintsParser.parse(expr)
    assert con.coefficients == coeffs
    assert con.operator == op
    assert con.rhs == rhs


INVALID_CONSTRAINTS = [
    "",
    "   ",
    "2x1 + 3x2",            # no operator
    "2x1 <= abc",           # non-numeric rhs
    "2x1 + 2x1 <= 4",       # duplicate variable
    "2y1 + 3x2 <= 5",       # unknown token
    "2x1 + <= 5",           # dangling operator
    "x1 + x2 <= 3 <= 4",    # two operators
    "<= 5",                 # empty lhs
]


@pytest.mark.parametrize("expr", INVALID_CONSTRAINTS)
def test_constraint_invalid(expr):
    with pytest.raises(ValueError):
        ConstraintsParser.parse(expr)


def test_constraint_dict_round_trip():
    con = ConstraintsParser.parse("2x1 - 3x2 <= 10")
    again = Constraint.from_dict(con.to_dict())
    assert again.coefficients == con.coefficients
    assert again.operator == con.operator
    assert again.rhs == con.rhs


# ------------------------------ validator -------------------------------- #
class TestConstraintsValidator:
    def test_consecutive_ok(self):
        ConstraintsValidator.validate_consecutive_variables(
            {"x1": 1.0, "x2": 2.0, "x3": 3.0}
        )

    def test_gap_rejected(self):
        with pytest.raises(ValueError, match="x2"):
            ConstraintsValidator.validate_consecutive_variables(
                {"x1": 1.0, "x3": 3.0}
            )

    def test_start_rejected(self):
        with pytest.raises(ValueError, match="comenzar en x1"):
            ConstraintsValidator.validate_consecutive_variables({"x2": 1.0})

    def test_empty_ok(self):
        ConstraintsValidator.validate_consecutive_variables({})

    def test_set_consistency(self):
        cons = [
            Constraint({"x1": 1.0, "x2": 1.0}, "<=", 4.0),
            Constraint({"x1": 2.0, "x2": 0.0}, ">=", 1.0),
        ]
        assert ConstraintsValidator.validate_set_consistency(cons)

    def test_set_inconsistency(self):
        cons = [
            Constraint({"x1": 1.0, "x2": 1.0}, "<=", 4.0),
            Constraint({"x1": 2.0}, ">=", 1.0),
        ]
        with pytest.raises(ValueError, match="Inconsistencia"):
            ConstraintsValidator.validate_set_consistency(cons)


def test_numeric_variable_order():
    # Deliberate fix vs the reference's lexicographic sort (SURVEY.md §2.1):
    # x2 must come before x10.
    names = [f"x{i}" for i in range(1, 12)]
    import random

    shuffled = names[:]
    random.Random(0).shuffle(shuffled)
    assert variable_order(shuffled) == names
