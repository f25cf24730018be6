"""Camera geometry core: Lie algebra, projection chains, ray generation."""

from mc_nerf_tpu.cameras.lie import (  # noqa: F401
    se3_to_SE3,
    SE3_to_se3,
    so3_to_SO3,
    SO3_to_so3,
    skew,
)
from mc_nerf_tpu.cameras.projection import (  # noqa: F401
    to_hom,
    pix2cam,
    cam2pix,
    cam2world,
    world2cam,
    invert_pose,
    invert_K,
    compose_poses,
)
from mc_nerf_tpu.cameras.convention import (  # noqa: F401
    blender_pose_to_w2c,
    w2c_to_blender_pose,
    fov_to_K,
)
from mc_nerf_tpu.cameras.rays import (  # noqa: F401
    pixel_grid,
    rays_for_pixels,
    rays_full_image,
)
