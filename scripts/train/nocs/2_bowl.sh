#!/bin/bash
# CoordNet + RotationNet training for NOCS bottle (reference
# scripts/train/nocs/2_bowl.sh equivalent)
python -m captra_tpu.cli.train --config=config_coordnet.yml \
    --obj_config=obj_info_nocs.yml --obj_category=2 \
    --experiment_dir=runs/2_bowl_coord "$@"
python -m captra_tpu.cli.train --config=config_rotnet.yml \
    --obj_config=obj_info_nocs.yml --obj_category=2 \
    --experiment_dir=runs/2_bowl_rot "$@"
