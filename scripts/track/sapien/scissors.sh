#!/bin/bash
# SAPIEN scissors tracking, batch 6 trajectories (reference
# scripts/track/sapien/scissors.sh)
python -m captra_tpu.cli.track --config=config_track.yml \
    --obj_config=obj_info_sapien.yml --obj_category=scissors \
    --experiment_dir=runs/scissors_rot --coord_exp/dir=runs/scissors_coord \
    --batch_size=6 --save "$@"
python -m captra_tpu.cli.evaluate --config=config_track.yml \
    --obj_config=obj_info_sapien.yml --obj_category=scissors \
    --experiment_dir=runs/scissors_rot
