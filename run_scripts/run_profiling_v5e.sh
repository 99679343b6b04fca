#!/bin/bash
# DeepCAM-TPU profiling sweep: one xprof trace per phase + roofline report.
# Capability parity with run_profiling_cori-gpu.sh's nsight metric sweep
# (/root/reference/src/deepCam/run_scripts/run_profiling_cori-gpu.sh:50-129):
# instead of one run per hardware counter, xprof captures all device counters
# in a single trace per phase, and the driver prints XLA-cost-model FLOPs/
# bytes + achieved-vs-peak roofline placement.

set -euo pipefail

OUTPUT_DIR=${OUTPUT_DIR:-/results/deepcam_profile}
DATA_DIR=${DATA_DIR:-}      # optional; synthetic batch if unset

for phase in Forward Backward Optimizer; do
    python -m deepcam_tpu.cli.profile \
        --run_tag "profile_${phase}" \
        --output_dir "${OUTPUT_DIR}" \
        ${DATA_DIR:+--data_dir_prefix "${DATA_DIR}"} \
        --local_batch_size 2 \
        --optimizer "LAMB" \
        --start_lr 1e-3 \
        --weight_decay 1e-2 \
        --num_warmup_steps 1 \
        --num_profile_steps 4 \
        --amp_opt_level O1 \
        --profile "${phase}" \
        |& tee -a "${OUTPUT_DIR}/profile_${phase}.out"
done
