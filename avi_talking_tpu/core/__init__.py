from .rotations import (
    batch_rodrigues,
    rotation_6d_to_matrix,
    matrix_to_rotation_6d,
    rot_mat_to_euler_y,
)
from .flame import FlameAssets, FlameModel, lbs, blend_shapes, vertices2landmarks
from .assets import (
    convert_flame_pickle,
    load_flame_assets,
    synthetic_assets,
    default_assets_path,
)
from .projection import batch_orth_proj
