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
from .bilateral_grid import bilateral_grid_lr, bilateral_slice, make_bilateral_grids, tv_loss  # noqa: F401
from .camera_opt import CameraOpt, pose_delta  # noqa: F401
from .depth_supervision import (  # noqa: F401
    DepthAnchor,
    depth_target,
    fit_depth_anchors,
    ls_affine_fit,
    make_anchor,
    ransac_affine_fit,
    ssi_depth_loss,
)
from .geometry_regularization import (  # noqa: F401
    depth_normal_consistency_loss,
    flatten_loss,
    pixel_rays,
)
from .sky_dome import (  # noqa: F401
    SkyDome,
    composite_sky,
    estimate_up_vec,
    fibonacci_sphere,
    sky_dome_directions,
    sky_opacity_loss,
)
