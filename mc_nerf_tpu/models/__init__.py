"""Model components: encodings, MLPs, SH shading, rendering, camera params."""

from mc_nerf_tpu.models.sh import eval_sh  # noqa: F401
from mc_nerf_tpu.models.encoding import sincos_encode, barf_weights  # noqa: F401
from mc_nerf_tpu.models.mlp import NerfMLPParams, init_nerf_mlp, apply_nerf_mlp  # noqa: F401
from mc_nerf_tpu.models.camera_params import CameraParams, init_camera_params  # noqa: F401
