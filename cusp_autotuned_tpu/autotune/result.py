"""Tuning results and status codes.

Parity: KTT's ResultStatus — the tuner treats CompilationFailed /
ComputationFailed / ValidationFailed / DeviceLimitsExceeded configurations as
skippable failures (testing/ktt.cu:101-116 relies on this)."""

from __future__ import annotations

import dataclasses
import enum
from typing import Dict, Any, Optional


class ResultStatus(enum.Enum):
    Ok = "Ok"
    CompilationFailed = "CompilationFailed"
    ComputationFailed = "ComputationFailed"
    ValidationFailed = "ValidationFailed"
    DeviceLimitsExceeded = "DeviceLimitsExceeded"


@dataclasses.dataclass
class TuningResult:
    configuration: Dict[str, Any]
    status: ResultStatus
    duration_ms: float = float("inf")
    compilation_ms: float = 0.0
    error: Optional[str] = None

    def is_valid(self) -> bool:
        return self.status == ResultStatus.Ok

    def to_json(self):
        return {
            "configuration": self.configuration,
            "status": self.status.value,
            "duration_ms": self.duration_ms,
            "compilation_ms": self.compilation_ms,
            "error": self.error,
        }

    @staticmethod
    def from_json(d):
        return TuningResult(
            configuration=dict(d["configuration"]),
            status=ResultStatus(d["status"]),
            duration_ms=float(d["duration_ms"]),
            compilation_ms=float(d.get("compilation_ms", 0.0)),
            error=d.get("error"),
        )
