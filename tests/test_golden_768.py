"""Production-resolution torch-golden parity (VERDICT r3 #6, r4 #6).

The committed goldens (golden/torch_golden_768*.npz) are full SD2.1-geometry
768^2 end-to-end torch fp32 forwards (scripts/make_torch_golden.py) for the
three decode paths — VAE-decode (genpercept), DPT-head, and the 10-step
marigold 8-ch path. The comparison rebuilds the same deterministic weights
and runs our jitted pipeline, enforcing the <=1e-2 bar — ~40+ min each on
this 1-core CPU box, so those tests are gated behind RUN_GOLDEN_768=1 (the
128^2 variants below run in the regular slow suite and cover the same code
paths end-to-end)."""

import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GOLDENS = {
    "genpercept": os.path.join(ROOT, "golden", "torch_golden_768.npz"),
    "dpt": os.path.join(ROOT, "golden", "torch_golden_768_dpt.npz"),
    "marigold": os.path.join(ROOT, "golden", "torch_golden_768_marigold.npz"),
}


@pytest.mark.skipif(not os.environ.get("RUN_GOLDEN_768"),
                    reason="~40+ min at 768^2 on 1 CPU core; set "
                           "RUN_GOLDEN_768=1 to run")
@pytest.mark.parametrize("path", list(GOLDENS))
def test_golden_768_parity(path):
    golden = GOLDENS[path]
    assert os.path.exists(golden), (
        f"generate with: python scripts/make_torch_golden.py --path {path}")
    sys.path.insert(0, os.path.join(ROOT, "scripts"))
    import make_torch_golden as G

    assert G.compare_ours(golden) == 0


def _run_small(tmp_path, path, steps=2):
    out = str(tmp_path / f"golden_128_{path}.npz")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "import sys; sys.argv=['x','--res','128','--out',%r,"
         "'--path',%r,'--steps',%r,'--compare','--force'];"
         "import runpy; runpy.run_path('scripts/make_torch_golden.py',"
         "run_name='__main__')" % (out, path, str(steps))],
        cwd=ROOT, env=env, capture_output=True, text=True, timeout=1500)
    assert r.returncode == 0, r.stdout + r.stderr
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["op"] == f"golden_768_parity_{path}" and rec["pass"]
    return rec


def test_golden_small_res_parity(tmp_path):
    """Same script, same code path, 128^2: torch golden generation +
    our-pipeline comparison under the bar (runs in the slow suite)."""
    rec = _run_small(tmp_path, "genpercept")
    assert rec["mean"] < 1e-4  # fp32-vs-fp32 should be essentially exact


def test_golden_small_res_parity_dpt(tmp_path):
    rec = _run_small(tmp_path, "dpt")
    # min-max normalization divides by the (small-activation) range of an
    # untrained head, so the tolerance is looser than the VAE-decode path
    assert rec["mean"] < 1e-3


def test_golden_small_res_parity_marigold(tmp_path):
    rec = _run_small(tmp_path, "marigold", steps=2)
    assert rec["mean"] < 1e-4
