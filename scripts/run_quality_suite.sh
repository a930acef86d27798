#!/bin/bash
# End-to-end quality suite: train every model family on the synthetic shape
# tree and produce the report-protocol tables (CD ratio at sigma=0.5% and
# 0.1%, Performance.txt noise/outlier ratios).
#
# Reference protocol: /root/reference/extra/report.pdf section 5.2-5.3 —
# train (train_dist.py / train_dist_PCN.py / train_dist_GAN.py /
# train_offset_outliers.py), voting inference (qualitative_inference_test.py),
# offline tables (compute_cd.py, measure_performance.py).  Stages:
#
#   1. PCN baseline        (cfgs/synthetic_quality_pcn.yaml)
#   2. flagship U-Net      (cfgs/synthetic_quality_diverse.yaml)
#   3. discriminator + GAN (cfgs/synthetic_quality_{disc,gan}.yaml)
#   4. full cleaning       (cfgs/synthetic_quality_cleaning.yaml)
#   5. chamfer+L1 loss row (cfgs/synthetic_quality_chamfer_l1.yaml)
#
# Every training runs under scripts/supervise.py (stall watchdog + kill +
# --auto_resume relaunch) so a relay hang costs minutes, not the run.
#
# Usage:
#   bash scripts/run_quality_suite.sh <shape-tree> <log-dir> <infer-dir> \
#       [stage ...]          # default: all stages in order
# The shape tree comes from scripts/make_synthetic_dataset.py --out <dir>.
set -u
cd "$(dirname "$0")/.."
DR=${1:?usage: run_quality_suite.sh <shape-tree> <log-dir> <infer-dir> [stages]}
QD=${2:?log dir}
QI=${3:?inference output dir}
shift 3
STAGES=${*:-pcn unet gan cleaning chamfer_l1}
mkdir -p "$QD" "$QI"
STATUS=$QD/suite_status.log
note() { echo "$(date +%H:%M:%S) $*" | tee -a "$STATUS"; }

sup() { # sup <exp-name> <train-cmd...>
  local exp=$1; shift
  mkdir -p "$QD/$exp"
  python scripts/supervise.py --log_file "$QD/$exp/log.txt" -- "$@" \
    >> "$QD/$exp/supervise.log" 2>&1
  note "train $exp rc=$?"
}

infer_cd() { # infer_cd <tag> <config> <sigma> <extra infer flags...>
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

for stage in $STAGES; do
  case $stage in
  pcn)
    sup synthetic_quality_pcn python scripts/train_pcn.py \
      --config_file cfgs/synthetic_quality_pcn.yaml \
      --data_root "$DR" --log_dir "$QD" --auto_resume
    for sig in 0.005 0.001; do
      infer_cd pcn_$sig cfgs/synthetic_quality_pcn.yaml $sig \
        --pcn --device_voting \
        --checkpoint "$QD/synthetic_quality_pcn/current"
    done ;;
  pcn4)
    # PointCleanNet-faithful level set (no sigma=0 replicas): the pcn3
    # row shows the single-patch PCN never escapes the zero-predictor
    # optimum when 1/3 of its shapes carry (near-)zero offsets
    sup synthetic_quality_pcn4 python scripts/train_pcn.py \
      --config_file cfgs/synthetic_quality_pcn4.yaml \
      --data_root "$DR" --log_dir "$QD" --auto_resume
    for sig in 0.005 0.001; do
      infer_cd pcn4_$sig cfgs/synthetic_quality_pcn4.yaml $sig \
        --pcn --device_voting \
        --checkpoint "$QD/synthetic_quality_pcn4/current"
    done ;;
  pcn3)
    # regime-matched PCN baseline (uniform per-shape noise) — see the
    # cfgs/synthetic_quality_pcn3.yaml header for why the mix-trained
    # pcn/pcn2 rows overshoot at uniform-noise eval
    sup synthetic_quality_pcn3 python scripts/train_pcn.py \
      --config_file cfgs/synthetic_quality_pcn3.yaml \
      --data_root "$DR" --log_dir "$QD" --auto_resume
    for sig in 0.005 0.001; do
      infer_cd pcn3_$sig cfgs/synthetic_quality_pcn3.yaml $sig \
        --pcn --device_voting \
        --checkpoint "$QD/synthetic_quality_pcn3/current"
    done ;;
  unet)
    sup synthetic_quality_diverse python scripts/train.py \
      --config_file cfgs/synthetic_quality_diverse.yaml \
      --data_root "$DR" --log_dir "$QD" --auto_resume
    for sig in 0.005 0.001; do
      infer_cd div_$sig cfgs/synthetic_quality_diverse.yaml $sig \
        --checkpoint "$QD/synthetic_quality_diverse/current"
    done ;;
  gan)
    sup synthetic_quality_disc python scripts/train_discriminator.py \
      --config_file cfgs/synthetic_quality_disc.yaml \
      --data_root "$DR" --log_dir "$QD" --auto_resume
    # _tuned: gan_alpha rebalanced for the synthetic regime's ~0.001 task
    # loss (the reference ALPHA=0.01 lets the adversarial term drag the
    # converged generator off the task optimum here — see RESULTS.md)
    sup synthetic_quality_gan_tuned python scripts/train_gan.py \
      --config_file cfgs/synthetic_quality_gan_tuned.yaml \
      --data_root "$DR" --log_dir "$QD" --auto_resume \
      --load_path_generator "$QD/synthetic_quality_diverse/current" \
      --load_path_discriminator "$QD/synthetic_quality_disc/current"
    for sig in 0.005 0.001; do
      infer_cd gan_$sig cfgs/synthetic_quality_gan_tuned.yaml $sig \
        --checkpoint "$QD/synthetic_quality_gan_tuned/generator/current"
    done ;;
  cleaning)
    sup synthetic_quality_cleaning python scripts/train_full_cleaning.py \
      --config_file cfgs/synthetic_quality_cleaning.yaml \
      --data_root "$DR" --log_dir "$QD" --auto_resume
    infer_cd clean_0.005 cfgs/synthetic_quality_cleaning.yaml 0.005 \
      --full_cleaning --checkpoint "$QD/synthetic_quality_cleaning/current"
    timeout 1800 python scripts/measure_performance.py \
      --in_dir "$QI/clean_0.005" >> "$QI/clean_0.005.log" 2>&1
    note "perf clean_0.005 rc=$?" ;;
  chamfer_l1)
    sup synthetic_quality_chamfer_l1 python scripts/train.py \
      --config_file cfgs/synthetic_quality_chamfer_l1.yaml \
      --data_root "$DR" --log_dir "$QD" --auto_resume
    for sig in 0.005 0.001; do
      infer_cd chl1_$sig cfgs/synthetic_quality_chamfer_l1.yaml $sig \
        --checkpoint "$QD/synthetic_quality_chamfer_l1/current"
    done ;;
  chamfer_sparse)
    # report section 5.2 row "Chamfer(L1)" — L1-norm chamfer, the
    # reference's worst loss (1.6 @ 0.5%, 54.14 @ 0.1%)
    sup synthetic_quality_chamfer_sparse python scripts/train.py \
      --config_file cfgs/synthetic_quality_chamfer_sparse.yaml \
      --data_root "$DR" --log_dir "$QD" --auto_resume
    for sig in 0.005 0.001; do
      infer_cd chsp_$sig cfgs/synthetic_quality_chamfer_sparse.yaml $sig \
        --checkpoint "$QD/synthetic_quality_chamfer_sparse/current"
    done ;;
  l1_chamfer_sparse)
    # report section 5.2 row "Chamfer(L1)+L1" (0.39 @ 0.5%, 19.44 @ 0.1%)
    sup synthetic_quality_l1_chamfer_sparse python scripts/train.py \
      --config_file cfgs/synthetic_quality_l1_chamfer_sparse.yaml \
      --data_root "$DR" --log_dir "$QD" --auto_resume
    for sig in 0.005 0.001; do
      infer_cd l1chsp_$sig cfgs/synthetic_quality_l1_chamfer_sparse.yaml \
        $sig \
        --checkpoint "$QD/synthetic_quality_l1_chamfer_sparse/current"
    done ;;
  chamfer15k)
    # the 15000-point chamfer geometry end-to-end on device (SURVEY §7
    # hard part; see cfgs/synthetic_quality_chamfer15k.yaml header)
    sup synthetic_quality_chamfer15k python scripts/train.py \
      --config_file cfgs/synthetic_quality_chamfer15k.yaml \
      --data_root "$DR" --log_dir "$QD" --auto_resume
    for sig in 0.005 0.001; do
      infer_cd ch15k_$sig cfgs/synthetic_quality_chamfer15k.yaml $sig \
        --checkpoint "$QD/synthetic_quality_chamfer15k/current"
    done ;;
  chamfer)
    sup synthetic_quality_chamfer python scripts/train.py \
      --config_file cfgs/synthetic_quality_chamfer.yaml \
      --data_root "$DR" --log_dir "$QD" --auto_resume
    for sig in 0.005 0.001; do
      infer_cd ch_$sig cfgs/synthetic_quality_chamfer.yaml $sig \
        --checkpoint "$QD/synthetic_quality_chamfer/current"
    done ;;
  stable)
    sup synthetic_quality_diverse_stable python scripts/train.py \
      --config_file cfgs/synthetic_quality_diverse_stable.yaml \
      --data_root "$DR" --log_dir "$QD" --auto_resume
    for sig in 0.005 0.001; do
      infer_cd stable_$sig cfgs/synthetic_quality_diverse_stable.yaml $sig \
        --checkpoint "$QD/synthetic_quality_diverse_stable/current"
    done ;;
  stable_low)
    sup synthetic_quality_stable_low python scripts/train.py \
      --config_file cfgs/synthetic_quality_stable_low.yaml \
      --data_root "$DR" --log_dir "$QD" --auto_resume
    for sig in 0.005 0.001; do
      infer_cd stlow_$sig cfgs/synthetic_quality_stable_low.yaml $sig \
        --device_voting \
        --checkpoint "$QD/synthetic_quality_stable_low/current"
    done ;;
  routed_low)
    # flagship for high-noise clouds, the low-noise SPECIALIST below the
    # routing threshold — the deployment configuration (device voting
    # routes per cloud by re-running the shared executable with the low
    # checkpoint's weights)
    for sig in 0.005 0.001; do
      infer_cd rtlow_$sig cfgs/synthetic_quality_diverse.yaml $sig \
        --device_voting \
        --checkpoint "$QD/synthetic_quality_diverse/current" \
        --checkpoint_low "$QD/synthetic_quality_stable_low/current"
    done ;;
  routed)
    # both-regime deployment behind ONE command: per-cloud noise estimate
    # routes between the flagship (mix) and diverse_stable checkpoints
    for sig in 0.005 0.001; do
      infer_cd routed_$sig cfgs/synthetic_quality_diverse.yaml $sig \
        --checkpoint "$QD/synthetic_quality_diverse/current" \
        --checkpoint_low "$QD/synthetic_quality_diverse_stable/current"
    done ;;
  *) note "unknown stage: $stage" ;;
  esac
done
note "suite complete: $STAGES"
