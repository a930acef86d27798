#!/bin/bash
# Round-5 training queue: runs after the flagship diverse run completes.
# 1) diverse_stable specialist as an 80-epoch warm-started fine-tune
#    (RESULTS.md round-4 protocol: matches the 400-epoch scratch run at
#    1/5 the budget)
# 2) pcn3: regime-matched PCN baseline (diverse_stable, 200 epochs)
set -u
cd "$(dirname "$0")/.."
DR=.data/shapes
QD=log

# wait for the flagship supervisor to exit
while kill -0 "$(cat /tmp/flagship.pid)" 2>/dev/null; do sleep 30; done
echo "$(date +%H:%M:%S) flagship done; launching diverse_stable fine-tune"

mkdir -p "$QD/synthetic_quality_diverse_stable"
python scripts/supervise.py --stall_timeout 1800 \
  --log_file "$QD/synthetic_quality_diverse_stable/log.txt" -- \
  python scripts/train.py \
  --config_file cfgs/synthetic_quality_diverse_stable.yaml \
  --data_root "$DR" --log_dir "$QD" --epochs 80 --auto_resume \
  --load_weights_path "$QD/synthetic_quality_diverse/current" \
  > "$QD/synthetic_quality_diverse_stable/supervise.log" 2>&1
echo "$(date +%H:%M:%S) stable fine-tune rc=$?; launching pcn3"

mkdir -p "$QD/synthetic_quality_pcn3"
python scripts/supervise.py --stall_timeout 1800 \
  --log_file "$QD/synthetic_quality_pcn3/log.txt" -- \
  python scripts/train_pcn.py \
  --config_file cfgs/synthetic_quality_pcn3.yaml \
  --data_root "$DR" --log_dir "$QD" --auto_resume \
  > "$QD/synthetic_quality_pcn3/supervise.log" 2>&1
echo "$(date +%H:%M:%S) pcn3 rc=$?"
