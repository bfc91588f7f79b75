"""Point-cloud and box-geometry primitives (jnp references + Pallas kernels)."""

from eda_tpu.ops.boxes import (  # noqa: F401
    box_center_to_corner,
    box_cxcyczwhd_to_xyzxyz,
    box_iou_3d,
    box_volume,
    generalized_box_iou_3d,
    pairwise_box_iou_3d,
)
from eda_tpu.ops.pointops import (  # noqa: F401
    ball_query,
    ball_query_nearest,
    furthest_point_sample,
    gather_points,
    group_points,
    three_interpolate,
    three_nn,
)
