"""simplex_tpu — a TPU-native linear-programming framework.

A from-scratch re-design of the capabilities of the-utn-team/simplex-solver
(see SURVEY.md): standard-form LPs with <=/>=/= constraints solved by a
two-phase tableau simplex expressed as jitted JAX/XLA/Pallas kernels, plus
batched (vmap), revised-simplex, first-order (PDHG) and multi-chip
(shard_map) paths, with the reference's services (storage, reports, web UI)
rebuilt on top.
"""
__version__ = "0.1.0"

from .core.parsing import (
    Constraint,
    ConstraintsParser,
    ConstraintsValidator,
    ObjectiveFunctionParser,
)
from .core.problem import LinearProgram, compile_standard_form
from .models.dense import (DenseSimplexSolver, SimplexResult,
                           reoptimize, solve_lp)
