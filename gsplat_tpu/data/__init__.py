from .colmap import (  # noqa: F401
    ColmapDataset,
    load_colmap,
    make_synthetic_dataset,
    read_cameras_bin,
    read_images_bin,
    read_points3d_bin,
)
