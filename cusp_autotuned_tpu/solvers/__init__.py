"""Krylov solvers (parity: cusp/krylov/) + convergence monitor."""

from cusp_autotuned_tpu.solvers.monitor import (
    Monitor, MonitorState, default_monitor, monitor_init, monitor_record,
)
from cusp_autotuned_tpu.solvers.cg import cg
from cusp_autotuned_tpu.solvers.bicgstab import bicgstab
from cusp_autotuned_tpu.solvers.bicg import bicg
from cusp_autotuned_tpu.solvers.cr import cr
from cusp_autotuned_tpu.solvers.gmres import gmres
from cusp_autotuned_tpu.solvers.cg_m import cg_m
from cusp_autotuned_tpu.solvers.bicgstab_m import bicgstab_m
from cusp_autotuned_tpu.solvers.mixed import refine, mixed_precision_cg
