"""Smoke-test the driver benchmark (bench.py) including the int8 branch.

bench.py is the driver contract for the headline number; on TPU it runs the
W8A8 int8 default-placement pipeline (calibrate -> quantize_from_stats with
PipelineConfig.int8_exclude -> bias correction), mirroring
GenPerceptPipeline._run. This test forces that branch on CPU with tiny
models so drift between bench.py's inline quantize() and the pipeline's
calibration flow breaks CI instead of the end-of-round bench run.
"""

import json

import jax.numpy as jnp


def _tiny_flagship(dtype=jnp.bfloat16):
    import jax

    from tests.test_pipeline import tiny_models

    m = tiny_models()
    return type(m)(
        unet=jax.tree.map(lambda x: x.astype(dtype), m.unet),
        vae=jax.tree.map(lambda x: x.astype(dtype), m.vae),
        unet_cfg=m.unet_cfg,
        vae_cfg=m.vae_cfg,
        text_embed=m.text_embed.astype(dtype),
    )


def test_bench_int8_branch_cpu(monkeypatch, capsys):
    import __graft_entry__
    import bench

    monkeypatch.setattr(__graft_entry__, "_flagship_models", _tiny_flagship)
    monkeypatch.setenv("BENCH_INT8", "1")
    monkeypatch.setenv("BENCH_BATCH", "1")

    bench.main()

    line = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["metric"] == "img_per_s_per_chip_768_depth"
    assert rec["value"] > 0
    assert "int8" in rec["numerics"]
    assert rec["vs_baseline"] > 0


def test_bench_ladder_falls_back(monkeypatch, capsys):
    """The round-3 regression: a failure inside a rung (e.g. the asym
    calibration program's remote-compile HTTP 500) must fall down the
    ladder and still print a JSON line, never exit nonzero."""
    import __graft_entry__
    import bench

    monkeypatch.setattr(__graft_entry__, "_flagship_models", _tiny_flagship)
    monkeypatch.setenv("BENCH_INT8", "1")
    monkeypatch.setenv("BENCH_BATCH", "1")

    real_run_rung = bench.run_rung

    def failing_first_rungs(models, rung, batch, res, n_lo, n_hi):
        if rung["int8"]:
            raise RuntimeError(
                "INTERNAL: http://127.0.0.1:8083/remote_compile: HTTP 500")
        return real_run_rung(models, rung, batch, res, n_lo, n_hi)

    monkeypatch.setattr(bench, "run_rung", failing_first_rungs)
    bench.main()

    line = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["rung"] == "bf16"
    assert rec["numerics"] == "bf16"
    assert rec["value"] > 0


def test_bench_int8_reports_in_run_fidelity(monkeypatch, capsys):
    """The int8 rung's JSON must carry a mean_dev measured in THIS run
    (VERDICT r4 #4), not a cross-reference to a separate script."""
    import __graft_entry__
    import bench

    monkeypatch.setattr(__graft_entry__, "_flagship_models", _tiny_flagship)
    monkeypatch.setenv("BENCH_INT8", "1")
    monkeypatch.setenv("BENCH_BATCH", "1")

    bench.main()

    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    if "int8" in rec["numerics"]:
        assert 0 <= rec["mean_dev"] < bench.FIDELITY_BAR
        assert "in-run mean deviation" in rec["numerics"]


def test_bench_fidelity_failure_falls_down_ladder(monkeypatch, capsys):
    """A calibration-numerics regression (deviation over the bar) must fall
    down the ladder to bf16, not report under the <=1e-2 banner. Forced by
    shrinking the bar below any real quantization error."""
    import __graft_entry__
    import bench

    monkeypatch.setattr(__graft_entry__, "_flagship_models", _tiny_flagship)
    monkeypatch.setenv("BENCH_INT8", "1")
    monkeypatch.setenv("BENCH_BATCH", "1")
    monkeypatch.setattr(bench, "FIDELITY_BAR", 0.0)  # any dev >= 0 fails

    bench.main()

    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["rung"] == "bf16"
    assert rec["numerics"] == "bf16"
    assert rec["mean_dev"] == 0.0


def test_bench_oom_halves_batch(monkeypatch, capsys):
    """OOM-shaped errors retry the SAME rung at half the batch."""
    import __graft_entry__
    import bench

    monkeypatch.setattr(__graft_entry__, "_flagship_models", _tiny_flagship)
    monkeypatch.setenv("BENCH_INT8", "1")
    monkeypatch.setenv("BENCH_BATCH", "4")

    real_run_rung = bench.run_rung
    seen = []

    def oom_above_1(models, rung, batch, res, n_lo, n_hi):
        seen.append((rung["name"], batch))
        if batch > 1:
            raise RuntimeError("RESOURCE_EXHAUSTED: Ran out of memory in hbm")
        return real_run_rung(models, rung, batch, res, n_lo, n_hi)

    monkeypatch.setattr(bench, "run_rung", oom_above_1)
    bench.main()

    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["batch"] == 1
    # same rung retried at 4 -> 2 -> 1, no rung change
    assert seen[:3] == [("int8-enc012-ff", 4), ("int8-enc012-ff", 2),
                        ("int8-enc012-ff", 1)]
