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
