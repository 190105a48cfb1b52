"""ASan/UBSan gate for the native projection core.

Compiles tools/sanitize_projection.cc together with
r2dm_tpu/data/native/projection.cc under address+undefined sanitizers
(-fno-sanitize-recover: any finding aborts) and runs its adversarial input
sweep — non-finite coordinates, huge/denormal magnitudes, ring-ordering
stress, a realistic random scan. The reference has no native code and no
sanitizer story (SURVEY.md §5); our ingest hot path gets one here.
"""

import shutil
import subprocess
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.slow
def test_projection_core_sanitized(tmp_path):
    if shutil.which("g++") is None:
        pytest.skip("g++ not available")
    exe = tmp_path / "sanitize_projection"
    build = subprocess.run(
        [
            "g++", "-g", "-O1", "-std=c++17",
            # g++'s 'undefined' group does NOT include float-cast-overflow
            # (probed on this toolchain) — the NaN->int hazard this gate
            # exists for needs the explicit flag
            "-fsanitize=address,undefined,float-cast-overflow",
            "-fno-sanitize-recover=all",
            str(REPO / "tools" / "sanitize_projection.cc"),
            str(REPO / "r2dm_tpu" / "data" / "native" / "projection.cc"),
            "-o", str(exe),
        ],
        capture_output=True,
        text=True,
        timeout=180,
    )
    assert build.returncode == 0, build.stderr
    run = subprocess.run(
        [str(exe)], capture_output=True, text=True, timeout=300,
        env={"ASAN_OPTIONS": "detect_leaks=1", "UBSAN_OPTIONS": "print_stacktrace=1"},
    )
    assert run.returncode == 0, run.stdout + run.stderr
    assert "all cases clean" in run.stdout
    for banner in ("ERROR: AddressSanitizer", "runtime error", "LeakSanitizer"):
        assert banner not in run.stdout + run.stderr, run.stdout + run.stderr
