#!/bin/bash
# Hardware smokes for the three models that exceeded round-2's per-command
# compile window (VERDICT r2 next-step #4): UNO, UNetConvNext,
# AttentionUNet.  Run as ONE background job so the chip and the remote
# compiler are used serially; each leg gets its own generous timeout (the
# round-2 failure was the 600 s foreground window, not the compile itself).
#
# Usage: bash scripts/run_unet_smokes.sh /tmp/smoke_well /tmp/smoke_exp
set -u
WELL=${1:-/tmp/smoke_well}
ROOT=${2:-/tmp/smoke_exp}
cd /root/repo

common="data.base_path=$WELL data.dataset_name=synthetic_waves \
  data.batch_size=2 data.n_steps_output=2 data.eval_steps_output=4 data.data_workers=2 \
  trainer.max_epoch=2 trainer.n_steps_output=2 trainer.n_steps_rollout=4 \
  root_path=$ROOT"

run_leg () {
  name=$1; shift
  echo "=== $name train: $(date) ==="
  timeout 5400 python -m tante_tpu.cli.train "$@" experiment="$name" || {
    echo "=== $name FAILED/TIMED OUT ==="; return 1; }
  echo "=== $name done: $(date) ==="
  ls "$ROOT/experiments/$name" || true
}

run_leg UNO_SMOKE --config-name=uno $common model.width=16
run_leg UNETCN_SMOKE --config-name=unet_convnext $common model.init_features=8
run_leg UNETATT_SMOKE --config-name=unet_att $common model.depth=4
echo "=== all legs attempted: $(date) ==="
