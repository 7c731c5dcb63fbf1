"""Krylov solvers (parity: cusp/krylov/) + convergence monitor."""

from cusp_autotuned_tpu.solvers.monitor import (
    Monitor, MonitorState, default_monitor, monitor_init, monitor_record,
)
from cusp_autotuned_tpu.solvers.cg import cg
