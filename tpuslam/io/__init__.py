"""IO: configs, dataset loaders (TUM/EuRoC/KITTI + synthetic), trajectories."""
