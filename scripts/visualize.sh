# Visualization recipes (reference scripts/visualize.sh)

# nocs: overlay tracked boxes on the real_test scene images
python -m captra_tpu.cli.visualize --experiment_dir runs/1_bottle_rot \
    --img_path ../data/nocs_data/nocs_full/real_test --output_path ../nocs_viz

# sapien (any category): 3D box plots from saved result pickles
python -m captra_tpu.cli.visualize --experiment_dir runs/laptop_rot
python -m captra_tpu.cli.visualize --experiment_dir runs/glasses_rot
python -m captra_tpu.cli.visualize --experiment_dir runs/scissors_rot
python -m captra_tpu.cli.visualize --experiment_dir runs/drawers_rot
