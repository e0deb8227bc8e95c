from .poisson import (
    find_building_floors,
    poisson_disc_2d,
    sample_camera_locations_building,
    sample_camera_locations_object,
    sample_camera_yaw_roll,
)
from .points import (
    sample_surface_points,
    line_of_sight_matrix,
    obliqueness_matrix,
    sample_fov,
    in_frustum,
    generate_points,
    prune_points,
)
from .schema import (
    file_name_for,
    parse_filename,
    save_point_info,
    load_point_info,
    save_camera_poses,
)
from .trajectory import order_cameras_chain, interpolate_trajectory, frame_uuid
