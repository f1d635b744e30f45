"""Optimization engine: fused lax.scan Adam edits + objectives."""

from rgie_tpu.engine.optimize import (
    OptResult,
    lr_ramp_schedule,
    make_edit_program,
    make_optimizer,
    optimize_gradient_free,
)
from rgie_tpu.engine.optimize import optimize as run_optimize
