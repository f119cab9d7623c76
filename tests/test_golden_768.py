"""Production-resolution torch-golden parity (VERDICT r3 #6).

The committed golden (golden/torch_golden_768.npz) is a full SD2.1-geometry
768^2 end-to-end torch fp32 forward (scripts/make_torch_golden.py). The
comparison rebuilds the same deterministic weights and runs our jitted
pipeline, enforcing the <=1e-2 bar — ~40 min on this 1-core CPU box, so the
test is gated behind RUN_GOLDEN_768=1 (the 128^2 variant below runs in the
regular slow suite and covers the same code path end-to-end)."""

import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN = os.path.join(ROOT, "golden", "torch_golden_768.npz")


@pytest.mark.skipif(not os.environ.get("RUN_GOLDEN_768"),
                    reason="~40 min at 768^2 on 1 CPU core; set "
                           "RUN_GOLDEN_768=1 to run")
def test_golden_768_parity():
    assert os.path.exists(GOLDEN), (
        "generate with: python scripts/make_torch_golden.py")
    sys.path.insert(0, os.path.join(ROOT, "scripts"))
    import make_torch_golden as G

    assert G.compare_ours(GOLDEN) == 0


def test_golden_small_res_parity(tmp_path):
    """Same script, same code path, 128^2: torch golden generation +
    our-pipeline comparison under the bar (runs in the slow suite)."""
    out = str(tmp_path / "golden_128.npz")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "import sys; sys.argv=['x','--res','128','--out',%r,"
         "'--compare','--force'];"
         "import runpy; runpy.run_path('scripts/make_torch_golden.py',"
         "run_name='__main__')" % out],
        cwd=ROOT, env=env, capture_output=True, text=True, timeout=1500)
    assert r.returncode == 0, r.stdout + r.stderr
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["op"] == "golden_768_parity" and rec["pass"]
    assert rec["mean"] < 1e-4  # fp32-vs-fp32 should be essentially exact
