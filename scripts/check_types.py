#!/usr/bin/env python
"""Gating annotation-coverage check (the locally-runnable half of the
reference's ``mypy --disallow-untyped-defs`` gate, ``Makefile:20-21``).

Every module-level and class-level function in ``segma_tpu/`` must carry
full parameter AND return annotations. Nested functions (jax closures,
decorated inner steps) are exempt — annotating a ``loss_fn(p)`` closure
adds noise, and mypy types them by inference from context in CI.

Exit 1 listing offenders; used by ``make type-check`` and CI. The full
mypy pass also runs in CI (this environment cannot install mypy).
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path


def _function_gaps(fn: ast.FunctionDef | ast.AsyncFunctionDef) -> list[str]:
    """Names of unannotated params (+ a '-> return' marker) for one def."""
    gaps: list[str] = []
    a = fn.args
    for arg in (*a.posonlyargs, *a.args, *a.kwonlyargs):
        if arg.annotation is None and arg.arg not in ("self", "cls"):
            gaps.append(arg.arg)
    if a.vararg is not None and a.vararg.annotation is None:
        gaps.append("*" + a.vararg.arg)
    if a.kwarg is not None and a.kwarg.annotation is None:
        gaps.append("**" + a.kwarg.arg)
    if fn.returns is None and fn.name != "__init__":
        gaps.append("-> return")
    return gaps


def check_file(path: Path) -> list[str]:
    """Offender lines for one file (top-level + class-level defs only)."""
    tree = ast.parse(path.read_text())
    offenders: list[str] = []

    def visit_scope(body: list[ast.stmt]) -> None:
        for node in body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                if node.name.startswith("__") and node.name != "__init__":
                    continue  # dunders: types fixed by protocol
                gaps = _function_gaps(node)
                if gaps:
                    offenders.append(
                        f"{path}:{node.lineno} {node.name}: "
                        f"missing [{', '.join(gaps)}]"
                    )
                # nested defs inside this function are exempt
            elif isinstance(node, ast.ClassDef):
                visit_scope(node.body)

    visit_scope(tree.body)
    return offenders


def main() -> int:
    root = Path(__file__).resolve().parent.parent / "segma_tpu"
    offenders: list[str] = []
    for path in sorted(root.rglob("*.py")):
        offenders.extend(check_file(path))
    if offenders:
        print(f"{len(offenders)} functions missing type annotations:")
        for line in offenders:
            print("  " + line)
        return 1
    print("annotation coverage OK (all public defs fully annotated)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
