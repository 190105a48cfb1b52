"""bench.py control-flow test (VERDICT r4 item 1b).

The driver bench is the round's scoreboard; round 4 lost its ddim-32 key to
an undefined name (`_warm_evidence`) in a path no test executed. This test
runs `bench.main` end-to-end on CPU with a tiny model and monkeypatched
protocol constants so the WHOLE script — primary trials, budget math, and
both `_secondary_headlines` blocks (flow euler-1 + ddim-32) — executes in
CI. A second case drives the warmup-overran-budget path (BENCH_r04 printed
a confusing negative remaining) and asserts the graceful skip keys.
"""

import json
import sys

import pytest


def _tiny_config():
    from r2dm_tpu.config import Config, DataConfig, ModelConfig

    return Config(
        data=DataConfig(resolution=(16, 64)),
        model=ModelConfig(
            base_channels=8,
            channel_multiplier=(1, 2, 2, 2),
            num_residual_blocks=(1, 1, 1, 1),
            gn_num_groups=4,
            attn_num_heads=2,
        ),
    )


def _run_bench(monkeypatch, capsys, budget: str):
    sys.path.insert(0, "/root/repo")
    import bench
    import r2dm_tpu

    monkeypatch.setattr(r2dm_tpu, "Config", _tiny_config)
    monkeypatch.setattr(bench, "STEPS", 8)
    monkeypatch.setattr(bench, "DDIM_STEPS", 4)
    monkeypatch.setattr(bench, "FLOW_REPS", 1)
    monkeypatch.setattr(bench, "MAX_TRIALS", 2)
    # share the suite's persistent compile cache so repeat runs are warm;
    # the warm-marker dotfiles land there too (harmless, and it exercises
    # the marker read/write path)
    monkeypatch.setattr(bench, "CACHE_DIR", "/tmp/r2dm_tpu_test_jax_cache")
    monkeypatch.setenv("R2DM_BENCH_BUDGET_S", budget)
    bench.main("", 4, 8)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


def test_bench_prints_primary_and_both_secondary_keys(monkeypatch, capsys):
    result = _run_bench(monkeypatch, capsys, budget="600")
    # primary headline
    assert result["metric"] == "sampling_throughput_8step_16x64"
    assert result["value"] > 0 and result["trials"] >= 1
    assert result["unit"] == "img/s/chip"
    assert "secondary_error" not in result, result.get("secondary_error")
    # both secondary blocks must have EXECUTED their gate and either run or
    # skipped with a reason — never silently vanish (the r04 failure mode)
    assert ("flow_euler1_img_per_s" in result) or ("flow_euler1_skipped" in result)
    assert ("ddim32_img_per_s" in result) or ("ddim32_skipped" in result)
    # on CPU with a warm-ish 600 s budget both should actually run
    assert result.get("flow_euler1_img_per_s", 0) > 0
    assert result.get("ddim32_img_per_s", 0) > 0


def test_bench_warmup_overrun_degrades_gracefully(monkeypatch, capsys):
    result = _run_bench(monkeypatch, capsys, budget="0")
    # warmup alone exceeds a zero budget: the primary still reports one
    # trial, the overrun is named, and the skip reasons cite it instead of
    # a negative remaining
    assert result["trials"] >= 1 and result["value"] > 0
    assert result["warmup_overran_s"] > 0
    assert "secondary_error" not in result, result.get("secondary_error")
    assert "warmup overran" in result.get("flow_euler1_skipped", "")
    assert "warmup overran" in result.get("ddim32_skipped", "")
