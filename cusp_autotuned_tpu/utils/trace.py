"""Call-tree tracing — the rebuild of the reference's `grapple` intercepting
execution policy (performance/grapple/my_execution_policy.h: wrap every
dispatched verb, record a nested call tree with timings).

Usage:
    with trace() as t:
        cg(A, b)
    t.print()

Python-idiomatic rebuild: a context manager patches the verb entry points
(multiply, convert, transpose, elementwise, SpGEMM, BLAS reductions) and
records nesting + wall time; no policy threading needed.

Boundary: calls inside already-jitted programs (e.g. each iteration of a
compiled solver loop) are one fused XLA computation and don't surface here —
use utils.profiling.device_trace (jax.profiler) for device-side timelines.
Setup paths, eager verbs, and first-trace call trees are fully visible.
"""

from __future__ import annotations

import contextlib
import dataclasses
import sys
import time
from typing import Any, List, Optional


@dataclasses.dataclass
class TraceRecord:
    name: str
    detail: str
    depth: int
    duration_ms: float


class Trace:
    def __init__(self):
        self.records: List[TraceRecord] = []
        self._depth = 0

    def print(self, stream=None) -> None:
        stream = stream or sys.stdout
        stream.write(f"trace: {len(self.records)} calls\n")
        for r in self.records:
            stream.write(f"  {'  ' * r.depth}{r.name}({r.detail})"
                         f"  {r.duration_ms:.3f} ms\n")

    def total_ms(self, name: Optional[str] = None) -> float:
        return sum(r.duration_ms for r in self.records
                   if r.depth == 0 and (name is None or r.name == name))

    def counts(self) -> dict:
        out: dict = {}
        for r in self.records:
            out[r.name] = out.get(r.name, 0) + 1
        return out


def _describe(a: Any) -> str:
    try:
        shape = getattr(a, "shape", None)
        fmt = getattr(a, "format", None)
        if fmt and shape is not None and len(shape) == 2:
            return f"{fmt}<{shape[0]}x{shape[1]}>"
        if shape is not None:
            return "x".join(map(str, shape))
    except Exception:  # noqa: BLE001 — description is best-effort
        pass
    return type(a).__name__


_PATCH_POINTS = [
    ("cusp_autotuned_tpu.ops.multiply", ["multiply", "generalized_spmv"]),
    ("cusp_autotuned_tpu.ops.convert", ["convert"]),
    ("cusp_autotuned_tpu.ops.transpose", ["transpose"]),
    ("cusp_autotuned_tpu.ops.elementwise", ["elementwise"]),
    ("cusp_autotuned_tpu.ops.spgemm", ["spgemm"]),
    ("cusp_autotuned_tpu.ops.blas", ["dot", "dotc", "nrm2", "axpy", "axpby"]),
]


@contextlib.contextmanager
def trace():
    """Record every traced verb call issued inside the block."""
    import importlib
    t = Trace()
    saved = []

    def wrap(name, fn):
        def inner(*args, **kwargs):
            rec = TraceRecord(name, ", ".join(_describe(a) for a in args[:2]),
                              t._depth, 0.0)
            t.records.append(rec)
            t._depth += 1
            t0 = time.perf_counter()
            try:
                return fn(*args, **kwargs)
            finally:
                t._depth -= 1
                rec.duration_ms = (time.perf_counter() - t0) * 1e3
        return inner

    # patch the defining modules AND every namespace re-exporting the same
    # function (the package root and ops re-export the verbs)
    extra_namespaces = [importlib.import_module("cusp_autotuned_tpu"),
                        importlib.import_module("cusp_autotuned_tpu.ops")]
    for mod_name, fns in _PATCH_POINTS:
        mod = importlib.import_module(mod_name)
        for fname in fns:
            fn = getattr(mod, fname)
            wrapped = wrap(fname, fn)
            saved.append((mod, fname, fn))
            setattr(mod, fname, wrapped)
            for ns in extra_namespaces:
                if getattr(ns, fname, None) is fn:
                    saved.append((ns, fname, fn))
                    setattr(ns, fname, wrapped)
    try:
        yield t
    finally:
        for mod, fname, fn in saved:
            setattr(mod, fname, fn)
