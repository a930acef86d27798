#!/bin/bash
# Round-5 quality evals (run after the training queue finishes):
#   1. deployed two-regime routing (flagship + stable, auto-routed) at
#      sigma=0.5% AND 0.1%  — VERDICT r4 item 7
#   2. flagship-only rows (headline reproduction)
#   3. pcn3 regime-matched PCN rows — VERDICT r4 item 6
set -u
cd "$(dirname "$0")/.."
DR=.data/shapes
QD=log
QI=infer_out
mkdir -p "$QI"
note() { echo "$(date +%H:%M:%S) $*" | tee -a "$QI/evals.log"; }

run_cd() { # run_cd <tag> <cfg> <sigma> <extra...>
  local tag=$1 cfg=$2 sig=$3; shift 3
  timeout 5400 python scripts/infer.py --config_file "$cfg" \
    --data_root "$DR" --out_dir "$QI/$tag" \
    --noise_type gaussian --noise_level "$sig" "$@" \
    >> "$QI/$tag.log" 2>&1
  note "infer $tag rc=$?"
  timeout 1800 python scripts/compute_cd.py --in_dir "$QI/$tag" \
    >> "$QI/$tag.log" 2>&1
  note "cd $tag rc=$? $(grep -im1 mean "$QI/$tag/CD_table.txt" 2>/dev/null)"
}

CKPT="$QD/synthetic_quality_diverse/current"
for sig in 0.005 0.001; do
  # deployed: auto-routes to the _stable sibling below --route_sigma
  run_cd deployed_$sig cfgs/synthetic_quality_diverse.yaml $sig \
    --checkpoint "$CKPT"
  # flagship-only (routing disabled) — the r1-r4 comparison row
  run_cd div_$sig cfgs/synthetic_quality_diverse.yaml $sig \
    --checkpoint "$CKPT" --checkpoint_low none
  # stable-only
  run_cd stable_$sig cfgs/synthetic_quality_diverse_stable.yaml $sig \
    --checkpoint "$QD/synthetic_quality_diverse_stable/current" \
    --checkpoint_low none
done
for sig in 0.005 0.001; do
  run_cd pcn3_$sig cfgs/synthetic_quality_pcn3.yaml $sig \
    --pcn --device_voting \
    --checkpoint "$QD/synthetic_quality_pcn3/current"
done
note "evals done"
