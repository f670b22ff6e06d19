# Offline evaluation of saved tracking results (reference scripts/eval.sh)

for c in 1_bottle 2_bowl 3_camera 4_can 5_laptop 6_mug; do
  python -m captra_tpu.cli.evaluate --config=config_track.yml \
      --obj_config=obj_info_nocs.yml --obj_category=${c%%_*} \
      --experiment_dir=runs/${c}_rot
done

for c in glasses laptop scissors drawers; do
  python -m captra_tpu.cli.evaluate --config=config_track.yml \
      --obj_config=obj_info_sapien.yml --obj_category=$c \
      --experiment_dir=runs/${c}_rot
done
