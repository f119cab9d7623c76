#!/usr/bin/env bash
# One-command 7-checkpoint <=1e-2 parity report (VERDICT r4 #8): run the
# minute the published weights land on disk (zero egress blocks them today).
#
#   bash scripts/download_weights.sh weights/        # needs egress
#   bash scripts/parity_real_all.sh weights/ [--reference_dir refs/]
#
# Loops scripts/parity_real.py over the 7 published checkpoints
# (reference README.md:46-52 zoo; load path reference run.py:283-357),
# writing per-checkpoint JSON reports under /tmp/genpercept_parity/<task>/
# and exiting nonzero if ANY enforced bar fails. If --reference_dir is
# given, each task's torch-reference npz (<dir>/<task>.npz, produced per
# the parity_real.py docstring recipe) is enforced at <=1e-2.
set -uo pipefail

WEIGHTS_DIR="${1:-./weights}"
shift || true
REF_DIR=""
if [ "${1:-}" = "--reference_dir" ]; then REF_DIR="$2"; shift 2; fi

declare -A MODES=(
  [depth]=depth [normal]=normal [dis]=dis [matting]=matting [seg]=seg
  [disparity]=disparity [disparity-dpt-head]=disparity
)
rc=0
for task in depth normal dis matting seg disparity disparity-dpt-head; do
  ckpt="$WEIGHTS_DIR/genpercept-$task"
  [ -d "$ckpt" ] || { echo "SKIP $task: $ckpt missing"; rc=1; continue; }
  extra=()
  [ -n "$REF_DIR" ] && [ -f "$REF_DIR/$task.npz" ] \
    && extra+=(--reference "$REF_DIR/$task.npz")
  echo "=== $task ==="
  python scripts/parity_real.py --checkpoint "$ckpt" \
    --mode "${MODES[$task]}" --out "/tmp/genpercept_parity/$task" \
    --export_roundtrip "${extra[@]}" || rc=1
done
exit $rc
