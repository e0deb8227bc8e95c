from .mesh import (
    split_long_edges,
    subdivide_mesh,
    load_obj_mtl,
    parse_mtl,
    TriangleMesh,
    from_arrays,
    compute_normals,
    gathered_triangles,
    cube,
    quad_plane,
    room,
    uv_sphere,
    load_obj,
    load_ply,
)
from .raycast import RayHits, raycast, any_hit_within, count_crossings
from .raster import Fragments, render_view, render_views, render_view_pallas, render_views_fused, scene_pack, bin_triangles
from .shade import (
    face_flat_colors,
    interpolate_vertex_attribute,
    smooth_normals_world,
    flat_normals_world,
    normals_to_camera,
    face_labels,
    vertex_colors,
    textured_colors,
    hit_points_world,
)
from .pano import pano_rays, render_pano, pano_camera
