#!/bin/bash
# NOCS bottle real_test tracking with on-device OTF crop (reference
# scripts/track/nocs/1_bottle.sh: --nocs_otf=True --batch_size=1)
python -m captra_tpu.cli.track --config=config_track.yml \
    --obj_config=obj_info_nocs.yml --obj_category=1 \
    --experiment_dir=runs/1_bottle_rot --coord_exp/dir=runs/1_bottle_coord \
    --nocs_otf=true --batch_size=1 --save "$@"
python -m captra_tpu.cli.evaluate --config=config_track.yml \
    --obj_config=obj_info_nocs.yml --obj_category=1 \
    --experiment_dir=runs/1_bottle_rot
