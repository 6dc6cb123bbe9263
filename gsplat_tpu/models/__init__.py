from .gaussians import (  # noqa: F401
    GaussianModel,
    export_ply,
    import_ply,
    initial_scales,
    inverse_sigmoid,
    reset_opacity,
    rgb_2_sh,
    sh_2_rgb,
)
