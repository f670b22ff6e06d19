#!/bin/bash
# SAPIEN glasses tracking, batch 6 trajectories (reference
# scripts/track/sapien/glasses.sh)
python -m captra_tpu.cli.track --config=config_track.yml \
    --obj_config=obj_info_sapien.yml --obj_category=glasses \
    --experiment_dir=runs/glasses_rot --coord_exp/dir=runs/glasses_coord \
    --batch_size=6 --save "$@"
python -m captra_tpu.cli.evaluate --config=config_track.yml \
    --obj_config=obj_info_sapien.yml --obj_category=glasses \
    --experiment_dir=runs/glasses_rot
