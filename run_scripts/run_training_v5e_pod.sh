#!/bin/bash
# DeepCAM-TPU training launch for a v5e pod slice (one process per host).
# Capability parity with the reference's run_training_{cori,circe,dgx2}.sh
# (/root/reference/src/deepCam/run_scripts/), re-expressed for TPU VMs:
# no srun/mpirun — jax.distributed wires up from the TPU metadata on each
# worker, so the same command runs on every host (e.g. via
# `gcloud compute tpus tpu-vm ssh ... --worker=all --command="..."`).

set -euo pipefail

DATA_DIR=${DATA_DIR:-/data/deepcam}          # contains train/ validation/ stats.h5
OUTPUT_DIR=${OUTPUT_DIR:-/results/deepcam}
RUN_TAG=${RUN_TAG:-deepcam_v5e_$(date +%Y%m%d%H%M)}
SPATIAL=${SPATIAL:-1}          # >1 shards each sample's H over ICI neighbors

python -m deepcam_tpu.cli.train \
    --wireup_method "auto" \
    --spatial "${SPATIAL}" \
    --async_checkpoint \
    --run_tag "${RUN_TAG}" \
    --data_dir_prefix "${DATA_DIR}" \
    --output_dir "${OUTPUT_DIR}" \
    --max_inter_threads 4 \
    --optimizer "LAMB" \
    --start_lr 1e-3 \
    --lr_schedule type="multistep",milestones="15000 25000",decay_rate="0.1" \
    --lr_warmup_steps 0 \
    --lr_warmup_factor 1. \
    --weight_decay 1e-2 \
    --logging_frequency 100 \
    --save_frequency 400 \
    --max_epochs 200 \
    --local_batch_size 2 \
    --amp_opt_level O1 \
    |& tee -a "${OUTPUT_DIR}/train_${RUN_TAG}.out"
