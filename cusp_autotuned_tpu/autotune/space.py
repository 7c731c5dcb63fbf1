"""Tuning-space machinery: parameters, constraints, enumeration.

Parity: KTT's AddParameter/AddConstraint as used by the fork's per-format
setup_tuning_parameters (cusp/system/cuda/ktt/{dia,csr,ell,coo}_multiply.h).
The concrete per-format spaces live next to the kernels
(cusp_autotuned_tpu.kernels.variants); this module is the generic engine.
"""

from __future__ import annotations

import dataclasses
import itertools
from typing import Any, Callable, Dict, List, Sequence, Tuple


@dataclasses.dataclass(frozen=True)
class Parameter:
    name: str
    values: Tuple[Any, ...]

    def __init__(self, name, values):
        object.__setattr__(self, "name", name)
        object.__setattr__(self, "values", tuple(values))


@dataclasses.dataclass
class TuningSpace:
    parameters: List[Parameter]
    constraints: List[Tuple[Sequence[str], Callable[..., bool]]] = \
        dataclasses.field(default_factory=list)

    def add_parameter(self, name, values):
        self.parameters.append(Parameter(name, values))

    def add_constraint(self, names, fn):
        """fn(*values_of_names) -> bool; configs violating it are excluded
        (parity: KTT AddConstraint)."""
        self.constraints.append((tuple(names), fn))

    def satisfies(self, config: Dict[str, Any]) -> bool:
        return all(fn(*(config[n] for n in names))
                   for names, fn in self.constraints)

    def configurations(self) -> List[Dict[str, Any]]:
        names = [p.name for p in self.parameters]
        out = []
        for combo in itertools.product(*(p.values for p in self.parameters)):
            cfg = dict(zip(names, combo))
            if self.satisfies(cfg):
                out.append(cfg)
        return out

    def __len__(self):
        return len(self.configurations())


def config_key(config: Dict[str, Any]) -> str:
    return ",".join(f"{k}={config[k]}" for k in sorted(config))


def configurations_for(A) -> List[Dict[str, Any]]:
    """All valid configurations for a matrix's format."""
    from cusp_autotuned_tpu.kernels.variants import tuning_space
    return tuning_space(A).configurations()
