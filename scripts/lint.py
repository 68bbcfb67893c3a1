#!/usr/bin/env python
"""Minimal static lint for the repo (no ruff/flake8 in the image).

Checks, per Python file:
  * F811-equivalent: duplicate top-level / class-scope def or class names
    (the round-2 `layer_norm` shadowing regression class of bug).
  * duplicate function defs inside the same function scope.

Exit non-zero on any finding. Run by scripts/ci.sh.
"""
from __future__ import annotations

import ast
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
TARGETS = ["omni_tpu", "tests", "scripts", "examples", "bench.py",
           "__graft_entry__.py"]


def check_scope(body, scope_name, path, findings):
    seen: dict[str, int] = {}
    for node in body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            # @overload / @property-setter style redefinitions are deliberate
            decos = {getattr(d, "id", getattr(d, "attr", "")) for d in node.decorator_list}
            if decos & {"overload", "setter", "getter", "deleter", "register"}:
                continue
            if node.name == "_":  # deliberate throwaway (pallas loop bodies)
                seen[node.name] = node.lineno
                continue
            if node.name in seen:
                findings.append(
                    f"{path}:{node.lineno}: redefinition of '{node.name}' "
                    f"(first defined at line {seen[node.name]}) in {scope_name}")
            seen[node.name] = node.lineno
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            check_scope(node.body, f"{scope_name}.{node.name}", path, findings)


def main() -> int:
    findings: list[str] = []
    files: list[Path] = []
    for t in TARGETS:
        p = ROOT / t
        if p.is_file():
            files.append(p)
        elif p.is_dir():
            files.extend(sorted(p.rglob("*.py")))
    for f in files:
        try:
            tree = ast.parse(f.read_text(), filename=str(f))
        except SyntaxError as e:
            findings.append(f"{f}: syntax error: {e}")
            continue
        check_scope(tree.body, "<module>", f.relative_to(ROOT), findings)
    for msg in findings:
        print(msg)
    if findings:
        print(f"lint: {len(findings)} finding(s)", file=sys.stderr)
        return 1
    print(f"lint: OK ({len(files)} files)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
