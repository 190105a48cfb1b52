"""Repo-wide undefined-global-name check (see tools/lint_names.py).

Guards against the round-4 bench regression class: an undefined symbol in a
non-default code path (`_warm_evidence` at the then bench.py:379) shipped
uncaught because no linter exists in this image and the path never ran
before the driver invoked it. This test runs the stdlib-symtable linter over
every source file so any such name fails CI immediately.
"""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_no_undefined_globals():
    sys.path.insert(0, str(REPO / "tools"))
    try:
        import lint_names
    finally:
        sys.path.pop(0)
    findings = []
    for path in lint_names.iter_source_files():
        findings.extend(lint_names.check_file(path))
    assert not findings, "\n".join(findings)


def test_linter_catches_planted_bug(tmp_path):
    """The checker must actually flag the historical bug shape."""
    sys.path.insert(0, str(REPO / "tools"))
    try:
        import lint_names
    finally:
        sys.path.pop(0)
    probe = tmp_path / "probe.py"
    probe.write_text(
        "def gate(batch, primary_compile_s):\n"
        "    return _warm_evidence('ddim', batch, primary_compile_s)\n"
    )
    old_repo = lint_names.REPO
    lint_names.REPO = tmp_path
    try:
        findings = lint_names.check_file(probe)
    finally:
        lint_names.REPO = old_repo
    assert len(findings) == 1 and "_warm_evidence" in findings[0]


def test_linter_cli_green():
    """`python tools/lint_names.py` exits 0 on the current tree."""
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "lint_names.py")],
        capture_output=True, text=True,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
