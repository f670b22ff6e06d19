#!/bin/bash
# SAPIEN drawers tracking, batch 6 trajectories (reference
# scripts/track/sapien/drawers.sh)
python -m captra_tpu.cli.track --config=config_track.yml \
    --obj_config=obj_info_sapien.yml --obj_category=drawers \
    --experiment_dir=runs/drawers_rot --coord_exp/dir=runs/drawers_coord \
    --batch_size=6 --save "$@"
python -m captra_tpu.cli.evaluate --config=config_track.yml \
    --obj_config=obj_info_sapien.yml --obj_category=drawers \
    --experiment_dir=runs/drawers_rot
