"""Disparity-space eval alignment path (cli.eval --alignment
least_square_disparity), used by the disparity checkpoints."""

import numpy as np
from PIL import Image


def test_cli_eval_disparity_alignment(tmp_path):
    from genpercept_tpu.cli.eval import main as eval_main
    from genpercept_tpu.data.datasets import PredNameMode, get_pred_name

    # toy NYU-format GT
    data_dir = tmp_path / "nyu"
    data_dir.mkdir()
    rng = np.random.default_rng(0)
    lines = []
    gt_depths = []
    for i in range(2):
        rgb = rng.uniform(0, 255, (120, 160, 3)).astype(np.uint8)
        depth_m = rng.uniform(1.0, 9.0, (120, 160)).astype(np.float32)
        gt_depths.append(depth_m)
        Image.fromarray(rgb).save(data_dir / f"rgb_{i:05d}.png")
        Image.fromarray((depth_m * 1000).astype(np.int32), mode="I").save(
            data_dir / f"depth_{i:05d}.png"
        )
        lines.append(f"rgb_{i:05d}.png depth_{i:05d}.png depth_{i:05d}.png")
    split = tmp_path / "split.txt"
    split.write_text("\n".join(lines))
    yaml_path = tmp_path / "ds.yaml"
    yaml_path.write_text(
        "dataset:\n  name: nyu_v2\n  disp_name: toy\n  dir: nyu\n"
        f"  filenames: {split}\n  eigen_valid_mask: false\n"
    )

    # predictions: affine transforms of GT DISPARITY (what a disparity
    # checkpoint produces) -> after disparity-space alignment the metrics
    # must be near-perfect
    pred_dir = tmp_path / "preds"
    pred_dir.mkdir()
    for i, depth_m in enumerate(gt_depths):
        disp = 1.0 / depth_m
        pred = 0.37 * disp + 0.11
        name = get_pred_name(f"rgb_{i:05d}.png", PredNameMode.rgb_id, ".npy")
        np.save(pred_dir / name, pred.astype(np.float32))

    out_dir = tmp_path / "out"
    summary = eval_main([
        "--dataset_config", str(yaml_path),
        "--base_data_dir", str(tmp_path),
        "--prediction_dir", str(pred_dir),
        "--output_dir", str(out_dir),
        "--alignment", "least_square_disparity",
    ])
    assert summary["abs_relative_difference"] < 1e-3
    assert summary["delta1_acc"] > 0.999
