"""Undefined-global-name linter (pyflakes-class check, stdlib-only).

Motivation: the round-4 driver bench lost its ddim-32 secondary headline to a
plain undefined symbol (`_warm_evidence`, bench.py:379 at the time) that sat
in a non-default code path and was never executed before shipping. No linter
is installed in this image, so this tool re-implements the one pyflakes check
that catches that bug class: for every function/class scope in every source
file, any name resolved as an implicit global must exist at module level
(imports, assignments, defs) or in builtins.

Scopes are resolved with the stdlib `symtable` module, so locals, closures,
comprehension scopes, parameters, and `global`/`nonlocal` declarations are
all handled by the real CPython symbol-table rules rather than an ad-hoc AST
walk. Modules using `from x import *` are skipped (cannot be checked
statically). Run as a script for a human report; `tests/test_lint.py` keeps
the repo clean in CI.
"""

from __future__ import annotations

import builtins
import symtable
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# Names defined by the module runtime rather than source text.
_MODULE_DUNDERS = {
    "__file__", "__name__", "__doc__", "__package__", "__spec__",
    "__loader__", "__builtins__", "__debug__", "__path__", "__class__",
    "__annotations__", "__dict__", "__module__", "__qualname__",
}

_BUILTINS = set(dir(builtins)) | _MODULE_DUNDERS


def _module_defined_names(top: symtable.SymbolTable) -> set[str]:
    """Names bound at module level: imports, assignments, def/class."""
    defined = set()
    for sym in top.get_symbols():
        if sym.is_imported() or sym.is_assigned() or sym.is_namespace():
            defined.add(sym.get_name())
    return defined


def _collect_explicit_globals(table: symtable.SymbolTable, out: set[str]) -> None:
    """Names bound via a `global` declaration in any nested scope."""
    for sym in table.get_symbols():
        if sym.is_declared_global() and sym.is_assigned():
            out.add(sym.get_name())
    for child in table.get_children():
        _collect_explicit_globals(child, out)


def _has_star_import(src: str) -> bool:
    import ast

    try:
        tree = ast.parse(src)
    except SyntaxError:
        return False
    return any(
        isinstance(node, ast.ImportFrom) and any(a.name == "*" for a in node.names)
        for node in ast.walk(tree)
    )


def _check_scope(table: symtable.SymbolTable, defined: set[str],
                 path: Path, findings: list[str]) -> None:
    for sym in table.get_symbols():
        name = sym.get_name()
        if not sym.is_referenced():
            continue
        # Only implicit globals can be undefined module-level references;
        # locals/params/frees/imports are bound by construction.
        if sym.is_global() and not sym.is_declared_global():
            if name not in defined and name not in _BUILTINS:
                findings.append(
                    f"{path.relative_to(REPO)}: scope '{table.get_name()}' "
                    f"(line {table.get_lineno()}) references undefined global "
                    f"'{name}'"
                )
    for child in table.get_children():
        _check_scope(child, defined, path, findings)


def check_file(path: Path) -> list[str]:
    src = path.read_text(encoding="utf-8")
    if _has_star_import(src):
        return []
    try:
        top = symtable.symtable(src, str(path), "exec")
    except SyntaxError as e:
        return [f"{path.relative_to(REPO)}: syntax error: {e}"]
    defined = _module_defined_names(top)
    _collect_explicit_globals(top, defined)
    findings: list[str] = []
    # Module scope itself: a referenced-but-never-bound name at module level
    # is either a builtin or undefined.
    for sym in top.get_symbols():
        name = sym.get_name()
        if (sym.is_referenced() and name not in defined
                and name not in _BUILTINS):
            findings.append(
                f"{path.relative_to(REPO)}: module scope references "
                f"undefined global '{name}'"
            )
    for child in top.get_children():
        _check_scope(child, defined, path, findings)
    return findings


def iter_source_files() -> list[Path]:
    skip_parts = {".git", "__pycache__", "golden", ".claude"}
    files = []
    for p in sorted(REPO.rglob("*.py")):
        if skip_parts & set(p.relative_to(REPO).parts):
            continue
        files.append(p)
    return files


def main() -> int:
    findings: list[str] = []
    files = iter_source_files()
    for path in files:
        findings.extend(check_file(path))
    for f in findings:
        print(f)
    print(f"checked {len(files)} files, {len(findings)} findings",
          file=sys.stderr)
    return 1 if findings else 0


if __name__ == "__main__":
    raise SystemExit(main())
