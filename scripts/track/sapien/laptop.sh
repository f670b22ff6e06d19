#!/bin/bash
# SAPIEN laptop tracking, batch 6 trajectories (reference
# scripts/track/sapien/laptop.sh)
python -m captra_tpu.cli.track --config=config_track.yml \
    --obj_config=obj_info_sapien.yml --obj_category=laptop \
    --experiment_dir=runs/laptop_rot --coord_exp/dir=runs/laptop_coord \
    --batch_size=6 --save "$@"
python -m captra_tpu.cli.evaluate --config=config_track.yml \
    --obj_config=obj_info_sapien.yml --obj_category=laptop \
    --experiment_dir=runs/laptop_rot
