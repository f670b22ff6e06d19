#!/bin/bash
# NOCS bottle real_test tracking with on-device OTF crop (reference
# scripts/track/nocs/4_can.sh: --nocs_otf=True --batch_size=1)
python -m captra_tpu.cli.track --config=config_track.yml \
    --obj_config=obj_info_nocs.yml --obj_category=4 \
    --experiment_dir=runs/4_can_rot --coord_exp/dir=runs/4_can_coord \
    --nocs_otf=true --batch_size=1 --save "$@"
python -m captra_tpu.cli.evaluate --config=config_track.yml \
    --obj_config=obj_info_nocs.yml --obj_category=4 \
    --experiment_dir=runs/4_can_rot
