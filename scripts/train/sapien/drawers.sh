#!/bin/bash
python -m captra_tpu.cli.train --config=config_coordnet.yml \
    --obj_config=obj_info_sapien.yml --obj_category=drawers \
    --experiment_dir=runs/drawers_coord "$@"
python -m captra_tpu.cli.train --config=config_rotnet.yml \
    --obj_config=obj_info_sapien.yml --obj_category=drawers \
    --experiment_dir=runs/drawers_rot "$@"
