#!/bin/bash
# CoordNet + RotationNet training for NOCS bottle (reference
# scripts/train/nocs/5_laptop.sh equivalent)
python -m captra_tpu.cli.train --config=config_coordnet.yml \
    --obj_config=obj_info_nocs.yml --obj_category=5 \
    --experiment_dir=runs/5_laptop_coord "$@"
python -m captra_tpu.cli.train --config=config_rotnet.yml \
    --obj_config=obj_info_nocs.yml --obj_category=5 \
    --experiment_dir=runs/5_laptop_rot "$@"
