"""omnidata-annotate — the end-to-end annotator CLI.

Parity with the reference entry point (omnidata_annotator/omnidata-annotate.sh:
``--model_path=... --task=... with KEY=VAL ...``; task ``all`` fans out), but
one process and one device pipeline instead of 20 job scripts each booting a
fresh Blender (jobs/run_single_job.sh:11-75).

    python -m omnidata_tpu.annotator.cli --model_path /path/to/mesh_dir \
        --task all with NUM_POINTS=12 RESOLUTION=512

The mesh is <model_path>/mesh.ply or mesh.obj. Outputs land in
<model_path>/<task>/point_{p}_view_{v}_domain_{task}.png plus
point_info/*.json + camera_poses.json — the reference's exact layout, so its
dataloaders (and ours) read the result directly.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

TASKS_ALL = [
    "points",
    "trajectory",
    "pano",
    "rgb",
    "normal",
    "depth_zbuffer",
    "depth_euclidean",
    "mask_valid",
    "reshading",
    "principal_curvature",
    "edge_texture",
    "edge_occlusion",
    "keypoints2d",
    "keypoints3d",
    "semantic",
    "fragments",
    "segment_unsup2d",
    "segment_unsup25d",
    "vanishing_points",
]

DEVICE_TASKS = {
    "rgb", "normal", "depth_zbuffer", "depth_euclidean", "mask_valid",
    "reshading", "principal_curvature", "edge_texture", "edge_occlusion",
    "keypoints2d", "semantic", "fragments",
}


_AXIS_VECS = {
    "X": (1, 0, 0), "Y": (0, 1, 0), "Z": (0, 0, 1),
    "-X": (-1, 0, 0), "-Y": (0, -1, 0), "-Z": (0, 0, -1),
}


def _obj_axis_matrix(forward: str, up: str):
    """Blender OBJ-import axis remap (reference OBJ_AXIS_FORWARD/UP): map
    the file's (forward, up) axes onto the world's (+Y forward, +Z up) —
    bpy axis_conversion's target. (Y, Z) is the identity; Blender's default
    OBJ flags (-Z, Y) give the classic (x, y, z) -> (x, -z, y)."""
    import numpy as np

    f = np.asarray(_AXIS_VECS[forward.upper()], np.float64)
    u = np.asarray(_AXIS_VECS[up.upper()], np.float64)
    r = np.cross(f, u)  # file-frame right axis -> world +X
    return np.stack([r, f, u])


def find_mesh(model_path: str, settings=None, task: str | None = None):
    """Load the scene mesh. Honors MODEL_FILE (plus RGB_MODEL_FILE /
    SEMANTIC_MODEL_FILE for their tasks), TEXTURE_FILE, and the
    OBJ_AXIS_FORWARD/UP import remap (reference settings.py). OBJs with a
    sibling .mtl load through the per-face-material path (load_obj_mtl) so
    rgb/semantic get the obj_mtl variants' material colors/labels."""
    import numpy as np_

    from ..mesh import from_arrays, load_obj, load_obj_mtl, load_ply

    tex = (getattr(settings, "TEXTURE_FILE", "") or None) if settings else None
    if tex and not os.path.isabs(tex):
        tex = os.path.join(model_path, tex)

    def load_any(p):
        if p.endswith(".ply"):
            return load_ply(p)
        mtl_exists = False
        with open(p) as fh:
            for line in fh:
                if line.startswith("mtllib"):
                    mtl = os.path.join(os.path.dirname(p), line.split()[-1])
                    mtl_exists = os.path.exists(mtl)
                    break
        mesh = load_obj_mtl(p)[0] if mtl_exists else load_obj(p, texture_path=tex)
        fwd = getattr(settings, "OBJ_AXIS_FORWARD", "Y") if settings else "Y"
        up = getattr(settings, "OBJ_AXIS_UP", "Z") if settings else "Z"
        if (fwd.upper(), up.upper()) != ("Y", "Z"):
            M = _obj_axis_matrix(fwd, up)
            v = np_.asarray(mesh.vertices) @ M.T
            nf = mesh.num_faces
            mesh = from_arrays(
                v, np_.asarray(mesh.faces[:nf]),
                vertex_colors=None if mesh.vertex_colors is None else np_.asarray(mesh.vertex_colors),
                face_labels=None if mesh.face_labels is None else np_.asarray(mesh.face_labels[:nf]),
                vertex_uvs=None if mesh.vertex_uvs is None else np_.asarray(mesh.vertex_uvs),
                texture=None if mesh.texture is None else np_.asarray(mesh.texture),
                face_colors=None if mesh.face_colors is None else np_.asarray(mesh.face_colors[:nf]),
            )
        return mesh

    names = []
    if settings is not None:
        if task == "rgb" and getattr(settings, "RGB_MODEL_FILE", ""):
            names.append(settings.RGB_MODEL_FILE)
        if task == "semantic" and getattr(settings, "SEMANTIC_MODEL_FILE", ""):
            names.append(settings.SEMANTIC_MODEL_FILE)
        if getattr(settings, "MODEL_FILE", ""):
            names.append(settings.MODEL_FILE)
    names += ["mesh.ply", "mesh.obj", "mesh_semantic.ply", "semantic.obj"]
    for name in names:
        p = os.path.join(model_path, name)
        if os.path.exists(p):
            mesh = load_any(p)
            max_edge = getattr(settings, "MAX_FACE_EDGE_METERS", 0) if settings else 0
            if max_edge:
                from ..mesh import subdivide_mesh

                mesh = subdivide_mesh(mesh, float(max_edge))
            return mesh
    raise FileNotFoundError(f"no mesh.ply/mesh.obj under {model_path}")


def run_points(model_path: str, settings) -> None:
    from ..sampling import (
        generate_points,
        prune_points,
        sample_camera_locations_building,
        sample_camera_locations_object,
        save_camera_poses,
        save_point_info,
    )

    mesh = find_mesh(model_path, settings)
    rng = np.random.RandomState(settings.RANDOM_SEED)
    pose_file = os.path.join(model_path, settings.CAMERA_POSE_FILE)
    if not settings.GENERATE_CAMERAS:
        if not os.path.exists(pose_file):
            # an explicit reuse request must not silently resample (the new
            # cameras would desynchronize point_info from rendered images)
            raise FileNotFoundError(
                f"GENERATE_CAMERAS=False but {pose_file} does not exist"
            )
        # reuse previously generated cameras (reference GENERATE_CAMERAS)
        import json

        cams = np.asarray(
            [c["location"] for c in json.load(open(pose_file))], np.float32
        )
    elif settings.SCENE:
        spacing = settings.MIN_CAMERA_DISTANCE or settings.MIN_CAMERA_SPACING
        cams = sample_camera_locations_building(
            mesh, rng,
            min_spacing=spacing,
            min_height=settings.MIN_CAMERA_HEIGHT,
            max_height=settings.MAX_CAMERA_HEIGHT,
            min_clearance=settings.MIN_CAMERA_DISTANCE_TO_MESH,
            max_cameras=settings.NUM_CAMERAS or None,
        )
    else:
        cams = sample_camera_locations_object(mesh, rng, max(settings.NUM_POINTS, 16),
                                              settings.SPHERE_SCALING_FACTOR)
    if settings.NUM_CAMERAS and len(cams) > settings.NUM_CAMERAS:
        # uniform subsample, not a positional prefix (poisson-disc order
        # grows outward from the seed — a prefix is a spatial blob)
        keep = rng.choice(len(cams), settings.NUM_CAMERAS, replace=False)
        cams = cams[np.sort(keep)]
    if len(cams) == 0:
        raise RuntimeError("no viable camera locations found")
    if settings.POINT_TYPE == "SWEEP":
        # per-camera sweep / pano cube-face views with K/RT matrices
        # (generate_points.py:624-686, io_utils.py:388-458)
        from ..sampling.sweep import generate_points_per_camera

        poses = {
            str(i).zfill(4): {
                "position": cams[i],
                "rotation": (np.pi / 2, 0.0, rng.uniform(-np.pi, np.pi)),
            }
            for i in range(len(cams))
        }
        infos = generate_points_per_camera(
            poses, num_points=settings.NUM_POINTS_PER_CAMERA,
            resolution=settings.RESOLUTION, rng=rng,
            panos=settings.CREATE_PANOS,
        )
        save_point_info(model_path, infos)
        save_camera_poses(model_path, cams)
        n_views = sum(len(v) for v in infos)
        print(f"[points] SWEEP: {len(infos)} cameras, {n_views} views")
        return
    infos = generate_points(
        mesh, cams, rng,
        n_points=settings.NUM_POINTS,
        min_views_per_point=settings.MIN_VIEWS_PER_POINT,
        max_views_per_point=settings.MAX_VIEWS_PER_POINT,
        resolution=settings.RESOLUTION,
    )
    infos = prune_points(infos, min_views=settings.MIN_VIEWS_AFTER_PRUNE,
                         min_nonfixated=settings.MIN_NONFIXATED_AFTER_PRUNE)
    save_point_info(model_path, infos)
    save_camera_poses(model_path, cams)
    n_views = sum(len(v) for v in infos)
    print(f"[points] {len(infos)} points, {n_views} views -> {model_path}/point_info")


def run_trajectory(model_path: str, settings) -> None:
    """Smooth-trajectory frames for each point (CREATE_TRAJECTORY parity:
    generate_points_smooth_trajectory.py): interpolated fixated frames with
    camera_uuid = zero-padded frame index saved into point_info."""
    import numpy as np_

    from ..core.rotations import matrix_to_euler_xyz, matrix_to_quat
    from ..sampling import load_point_info, save_point_info
    import jax.numpy as jnp
    from ..sampling.trajectory import interpolate_trajectory

    from ..core.rotations import euler_xyz_to_matrix, quat_to_matrix

    infos = load_point_info(model_path)
    out = []
    for views in infos:
        if len(views) < 2:
            continue
        pt = np_.asarray(views[0]["point_location"], np_.float32)
        cams = np_.stack([np_.asarray(v["camera_location"], np_.float32) for v in views])
        # keyframe rotations: the views' own fixated rotations (roll/FOV
        # continuity — the reference slerps camera_rotation_final)
        def _R_of(v):
            if "camera_rotation_final_quaternion" in v:
                return np_.asarray(quat_to_matrix(
                    jnp.asarray(v["camera_rotation_final_quaternion"], jnp.float32)))
            return np_.asarray(euler_xyz_to_matrix(
                jnp.asarray(v["camera_rotation_final"], jnp.float32)))

        key_Rs = np_.stack([_R_of(v) for v in views])
        locs, Rs, key_view, is_key = interpolate_trajectory(cams, pt, key_Rs)
        frames = []
        for t, (loc, R) in enumerate(zip(locs, Rs)):
            # interpolated frames copy the governing keyframe's point_info
            # (fov, point fields) like the reference's cur_point_info copy
            v = dict(views[int(key_view[t])])
            v["camera_uuid"] = str(t).zfill(4)
            v["view_id"] = t
            v["fixated"] = bool(is_key[t])
            v["camera_location"] = [float(x) for x in loc]
            v["camera_rotation_final"] = [
                float(x) for x in np_.asarray(matrix_to_euler_xyz(jnp.asarray(R)))
            ]
            v["camera_rotation_final_quaternion"] = [
                float(x) for x in np_.asarray(matrix_to_quat(jnp.asarray(R)))
            ]
            v["camera_distance"] = float(np_.linalg.norm(pt - loc))
            frames.append(v)
        out.append(frames)
    # a trajectory REPLACES its point's view set: clear the old fixated
    # view JSONs first or renders mix stale wide-baseline views with
    # trajectory frames under the same filename grammar
    import glob as glob_

    d = os.path.join(model_path, "point_info")
    for frames in out:
        pat = os.path.join(
            d, f"point_{frames[0]['point_uuid']}_view_*_domain_fixatedpose.json"
        )
        for f in glob_.glob(pat):
            os.remove(f)
    skipped = [v[0]["point_uuid"] for v in infos if len(v) < 2]
    if skipped:
        print(f"[trajectory] skipped single-view points (kept as-is): "
              f"{skipped[:8]}{'…' if len(skipped) > 8 else ''}")
    save_point_info(model_path, out)
    n = sum(len(v) for v in out)
    print(f"[trajectory] {len(out)} trajectories, {n} frames")


def run_device_tasks(model_path: str, tasks: list[str], settings,
                     host_tasks: tuple = (), mesh_task: str | None = None) -> None:
    """host_tasks: host cues (keypoints3d/segment_*) to compute from the
    in-flight device outputs, overlapped with the next device dispatch on a
    thread pool — instead of a separate serial pass re-reading PNGs
    (VERDICT r2 #7; reference: create_images_nonblender_utils.py:39-67)."""
    import jax.numpy as jnp

    from ..core.cameras import camera_from_view_dict
    from ..cues.curvature import bake_curvature_colors
    from ..cues.encode import save_png
    from ..sampling import file_name_for, load_point_info
    from ..utils.profiler import Profiler
    from .pipeline import annotate_view

    mesh = find_mesh(model_path, settings,
                     task=mesh_task or (tasks[0] if len(tasks) == 1 else None))
    if mesh.vertex_colors is None and mesh.face_colors is None:
        # neutral grey so rgb/edge/keypoint cues are defined for colorless meshes
        import jax.numpy as jnp_

        mesh = mesh._replace(
            vertex_colors=jnp_.full((mesh.num_vertices, 3), 0.5)
        )
    curv = None
    if "principal_curvature" in tasks:
        curv = bake_curvature_colors(mesh, min_radius=settings.MIN_CURVATURE_RADIUS)

    infos = load_point_info(model_path)
    for t in list(tasks) + list(host_tasks):
        os.makedirs(os.path.join(model_path, t), exist_ok=True)

    # multi-host: each process annotates its stripe of the point list (the
    # reference's num_chunk::total grammar, keyed on jax.process_index())
    from ..train.multihost import stripe

    infos = stripe(infos)

    mods = tuple(t for t in tasks if t in DEVICE_TASKS)
    kb = int(getattr(settings, "KEYPOINT_BLUR_RADIUS", 0))
    # cv2's kernel-size -> sigma rule
    kb_sigma = 0.3 * ((kb - 1) * 0.5 - 1) + 0.8 if kb > 1 else 0.0
    stop = int(getattr(settings, "STOP_VIEW_NUMBER", -1))
    if stop >= 0:  # render at most stop+1 views per point (reference knob)
        infos = [views[: stop + 1] for views in infos]
    flat_views = [v for views in infos for v in views]
    n_imgs = len(flat_views)
    kw = dict(tile=settings.RASTER_TILE, cap=settings.RASTER_CAP,
              chunk=settings.RASTER_CHUNK, modalities=mods,
              keypoint_blur_sigma=kb_sigma)

    # PNG encode/write dominates steady-state wall time (device render is
    # ~5 ms/view batched); overlap it with the next dispatch on a small
    # thread pool (the reference's Pool-over-views, as IO concurrency only)
    from concurrent.futures import ThreadPoolExecutor

    io_pool = ThreadPoolExecutor(max_workers=8)
    host_pool = _make_host_cue_pool() if host_tasks else None
    host_kv = _host_cue_settings_kv(settings) if host_tasks else None
    pending: list = []

    def write_outputs(view, arrs, dev_maps=None):
        """arrs: {modality: np array} for one view (already on host). Keys
        can be a subset of mods (e.g. no 'semantic' without face labels).
        dev_maps: this view's device-computed cue input maps (TPU batch
        path; see host_cues_for_view) — the host cues then skip their
        convolution-shaped prefixes."""
        for t in arrs:
            if t == "fragments":
                path = file_name_for(
                    os.path.join(model_path, t), view["point_uuid"],
                    view["view_id"], t, "npy",
                )
                pending.append(io_pool.submit(np.save, path, arrs[t]))
            else:
                path = file_name_for(
                    os.path.join(model_path, t), view["point_uuid"],
                    view["view_id"], t, settings.PREFERRED_IMG_EXT,
                )
                pending.append(io_pool.submit(save_png, path, arrs[t]))
        if host_pool is not None:
            cue_in = {t: np.asarray(arrs[t])
                      for t in _HOST_CUE_INPUTS if t in arrs}
            if dev_maps and "seg25d_q" in dev_maps:
                # segment_25d reads only the device channel maps then —
                # don't pickle 1.25 MB/view of unused planes to the pool
                cue_in.pop("normal", None)
                cue_in.pop("edge_occlusion", None)
            pending.append(host_pool.submit(
                _host_cue_job, model_path, view, tuple(host_tasks), host_kv,
                cue_in, dev_maps,
            ))

    import jax

    on_tpu = (jax.default_backend() == "tpu"
              or bool(getattr(settings, "FORCE_BATCHED_PATH", 0)))
    i = 0
    with Profiler("Render") as pflr:
        if on_tpu:
            # cross-view batching: K cameras per fused dispatch (the
            # throughput path of bench.py; ~5 ms/view at K=64 on v5e)
            from ..core.cameras import Camera
            from .pipeline import annotate_views

            K = int(getattr(settings, "VIEWS_PER_DISPATCH", 64))
            # FORCE_BATCHED_PATH off-TPU: Pallas kernels only run in
            # interpret mode on CPU (the XLA fallback is the per-view path)
            kw_batched = {**kw,
                          "interpret": jax.default_backend() != "tpu"}
            from ..mesh.pallas_raster import max_views_per_dispatch

            T_view = (settings.RESOLUTION // settings.RASTER_TILE) ** 2
            k_max = max_views_per_dispatch(T_view)
            if K > k_max:
                print(f"[annotate] clamping VIEWS_PER_DISPATCH {K} -> {k_max} "
                      f"(SMEM bound at {T_view} tiles/view)")
                K = k_max

            # device cue prefixes: the convolution-shaped parts of the host
            # cues ride the same dispatch as the render — NARF border maps
            # (74% of keypoints3d, cues/narf_device.py) and the segmentation
            # blur/channel maps (cues/seg_device.py); only the sequential
            # cores (region growing, Kruskal, ncut) stay in the host pool
            dev_narf = ("keypoints3d" in host_tasks
                        and "depth_zbuffer" in mods)
            if dev_narf:
                import math as _math

                from ..cues import narf_device as _nd

                res = settings.RESOLUTION
                maxm = float(settings.DEPTH_ZBUFFER_MAX_DISTANCE_METERS)
                n_lvl = _nd.max_levels_for(res, res)
            seg2d_sigma = float(settings.SEGMENTATION_2D_BLUR)
            dev_seg2d = ("segment_unsup2d" in host_tasks and "rgb" in mods
                         and seg2d_sigma > 0)
            dev_seg25d = ("segment_unsup25d" in host_tasks
                          and all(m in mods for m in
                                  ("depth_zbuffer", "normal",
                                   "edge_occlusion")))
            if dev_seg2d or dev_seg25d:
                from ..cues import seg_device as _sd

            def process(chunk_views, fetched):
                nonlocal i
                # batch arrays already on host (fetched by the fetch
                # thread, overlapping the pool's cue work on prior batches)
                out_np, dmaps_np = fetched
                for vi, view in enumerate(chunk_views):
                    vmaps = {}
                    bmaps_np = dmaps_np.get("narf")
                    if bmaps_np is not None:
                        f_px = res / (2.0 * _math.tan(
                            view["field_of_view_rads"] / 2.0))
                        S = min(len(bmaps_np),
                                _nd.n_levels_for(f_px, res, res))
                        vmaps["narf"] = [(lvl[0][vi], lvl[1][vi], lvl[2][vi])
                                         for lvl in bmaps_np[:S]]
                    for key in ("seg2d_q", "seg25d_q"):
                        if key in dmaps_np:
                            vmaps[key] = dmaps_np[key][vi]
                    write_outputs(view,
                                  {t: a[vi] for t, a in out_np.items()},
                                  vmaps or None)
                    i += 1
                    pflr.step(f"finished img {i}/{n_imgs}")

            # software pipeline: a 1-thread fetcher device_gets batch b
            # while b+1 renders AND while the main thread fans out batch
            # b-1's IO/cues — one host fetch per batch (per-view
            # np.asarray slices would each pay a device round-trip), off
            # the main thread (tunnel transfers are socket IO; they
            # release the GIL and overlap the CPU-bound cue pool)
            fetcher = ThreadPoolExecutor(max_workers=1)
            prev = None
            for s in range(0, n_imgs, K):
                chunk_views = flat_views[s : s + K]
                cams = [
                    camera_from_view_dict(v, resolution=settings.RESOLUTION)
                    for v in chunk_views
                ]
                while len(cams) < K and n_imgs > K:
                    cams.append(cams[-1])  # pad partial tail batch
                batch = Camera(
                    jnp.stack([c.location for c in cams]),
                    jnp.stack([c.R for c in cams]),
                    jnp.stack([c.fov for c in cams]),
                    settings.RESOLUTION,
                )
                out = annotate_views(batch, mesh, curv, **kw_batched)
                dmaps = {}
                if dev_narf:
                    depth_m = out["depth_zbuffer"].astype(jnp.float32) * (
                        maxm / 65535.0)
                    focal = res / (2.0 * jnp.tan(batch.fov / 2.0))
                    dmaps["narf"] = _nd.narf_border_maps(
                        depth_m, focal, n_lvl, maxm)
                if dev_seg2d and "rgb" in out:
                    dmaps["seg2d_q"] = _sd.seg2d_blur_maps(
                        out["rgb"], sigma=seg2d_sigma)
                if dev_seg25d:
                    dmaps["seg25d_q"] = _sd.seg25d_channel_maps(
                        out["depth_zbuffer"], out["normal"],
                        out["edge_occlusion"])
                fut = fetcher.submit(
                    jax.device_get,
                    ({t: out[t] for t in mods if t in out}, dmaps))
                if prev is not None:
                    process(prev[0], prev[1].result())
                prev = (chunk_views, fut)
            if prev is not None:
                process(prev[0], prev[1].result())
            fetcher.shutdown()
        else:
            import jax.numpy as jnp

            from ..mesh.raster import tile_candidate_counts

            for view in flat_views:
                cam = camera_from_view_dict(view, resolution=settings.RESOLUTION)
                # exactness on the XLA fallback path: render_view silently
                # drops candidates past `cap` per tile, so probe the true
                # per-tile counts and double cap (bounded recompiles: caps
                # are powers of two of the base) until it covers this view
                cap_eff = int(kw["cap"])
                max_count = int(jnp.max(
                    tile_candidate_counts(cam, mesh, tile=kw["tile"])))
                while cap_eff < max_count:
                    cap_eff *= 2
                out = annotate_view(cam, mesh, curv, **{**kw, "cap": cap_eff})
                write_outputs(view, {t: np.asarray(out[t])
                                     for t in mods if t in out})
                i += 1
                pflr.step(f"finished img {i}/{n_imgs}")
        for f in pending:
            f.result()  # surface any write error
        io_pool.shutdown()
        if host_pool is not None:
            host_pool.shutdown()


def run_pano(model_path: str, settings) -> None:
    """Equirectangular panoramas at each camera location (CREATE_PANOS
    parity: settings.py:38 2048x1024; outputs like the reference's
    point_XXXX_view_equirectangular_domain_*.png replica assets).

    Domains: depth_euclidean + depth_zbuffer
    (create_depth_zbuffer_images.py:26 renders panos too; for an
    equirectangular camera the z pass IS the ray length), normal,
    reshading (create_albedo_images.py:28 — point lamp at the pano camera
    origin), and rgb/semantic when the mesh carries colors/labels."""
    import json

    import jax.numpy as jnp

    from ..core.rotations import euler_xyz_to_matrix
    from ..cues.encode import encode_depth_16bit, img_as_uint8, save_png
    from ..cues.reshading import reshade
    from ..mesh.pano import pano_rays, render_pano
    from ..mesh.shade import face_labels as face_labels_fn
    from ..mesh.shade import smooth_normals_world

    from ..mesh.shade import textured_colors, vertex_colors

    mesh = find_mesh(model_path, settings)
    cams = json.load(open(os.path.join(model_path, "camera_poses.json")))
    W, H = settings.PANO_RESOLUTION
    R_level = euler_xyz_to_matrix(jnp.asarray([np.pi / 2, 0.0, 0.0]))
    has_rgb = mesh.vertex_colors is not None or (
        mesh.texture is not None and mesh.vertex_uvs is not None
    )
    tasks = ("depth_euclidean", "depth_zbuffer", "normal", "reshading")
    tasks += ("rgb",) if has_rgb else ()
    tasks += ("semantic",) if mesh.face_labels is not None else ()
    for t in tasks:
        os.makedirs(os.path.join(model_path, t), exist_ok=True)
    for cam in cams:
        loc = jnp.asarray(cam["location"], jnp.float32)
        frag = render_pano(loc, R_level, mesh, width=W, height=H)
        uid = cam["camera_id"]
        fn = lambda task, ext="png": os.path.join(
            model_path, task,
            f"point_{uid}_view_equirectangular_domain_{task}.{ext}",
        )
        save_png(fn("depth_euclidean"), np.asarray(
            encode_depth_16bit(frag.t, frag.valid,
                               settings.DEPTH_EUCLIDEAN_MAX_DISTANCE_METERS)))
        save_png(fn("depth_zbuffer"), np.asarray(
            encode_depth_16bit(frag.z, frag.valid,
                               settings.DEPTH_ZBUFFER_MAX_DISTANCE_METERS)))
        n_world = smooth_normals_world(frag, mesh)
        # pano normal colors: world-frame remap like the reference's Cycles
        # bump-material path (create_normal_images.py:140-173)
        col = jnp.stack([
            0.5 - 0.5 * n_world[..., 0],
            0.5 + 0.5 * n_world[..., 1],
            0.5 + 0.5 * n_world[..., 2],
        ], -1)
        col = jnp.where(frag.valid[..., None], jnp.clip(col, 0, 1), 0.5)
        save_png(fn("normal"), np.asarray(img_as_uint8(col)))
        _, dirs = pano_rays(loc, R_level, W, H)
        save_png(fn("reshading"), np.asarray(img_as_uint8(reshade(
            frag.t, n_world, dirs, frag.valid,
            settings.LAMP_ENERGY, settings.LAMP_HALF_LIFE_DISTANCE))))
        if has_rgb:
            if mesh.texture is not None and mesh.vertex_uvs is not None:
                rgb = textured_colors(frag, mesh)
            else:
                rgb = vertex_colors(frag, mesh)
            rgb = jnp.where(frag.valid[..., None], jnp.clip(rgb, 0, 1), 0.0)
            save_png(fn("rgb"), np.asarray(img_as_uint8(rgb)))
        if mesh.face_labels is not None:
            save_png(fn("semantic"), np.asarray(
                face_labels_fn(frag, mesh, 0).astype(jnp.uint8)))
    print(f"[pano] {len(cams)} panoramas at {W}x{H}")


HOST_CUE_TASKS = ("keypoints3d", "segment_unsup2d", "segment_unsup25d")


# inputs a host-cue worker may need from the device batch
_HOST_CUE_INPUTS = ("depth_zbuffer", "rgb", "normal", "edge_occlusion")
# the only settings host_cues_for_view reads (kept as a plain dict so jobs
# pickle into spawn'd worker processes; the settings object is a module)
_HOST_CUE_SETTING_KEYS = (
    "PREFERRED_IMG_EXT", "RESOLUTION", "KEYPOINT_SUPPORT_SIZE",
    "DEPTH_ZBUFFER_MAX_DISTANCE_METERS",
    "SEGMENTATION_2D_SCALE", "SEGMENTATION_2D_BLUR",
    "SEGMENTATION_2D_CUT_THRESH", "SEGMENTATION_2D_SELF_EDGE_WEIGHT",
    "SEGMENTATION_25D_DEPTH_WEIGHT", "SEGMENTATION_25D_NORMAL_WEIGHT",
    "SEGMENTATION_25D_EDGE_WEIGHT", "SEGMENTATION_25D_SCALE",
    "SEGMENTATION_25D_CUT_THRESH", "SEGMENTATION_25D_SELF_EDGE_WEIGHT",
)


def _host_cue_settings_kv(settings) -> dict:
    return {k: getattr(settings, k) for k in _HOST_CUE_SETTING_KEYS}


def _cpu_worker_init():
    # workers never touch the accelerator (the parent holds the TPU client)
    os.environ["JAX_PLATFORMS"] = "cpu"


def _make_host_cue_pool():
    """Worker pool for the CPU-bound host cues: a spawn'd process pool when
    cores are available (felzenszwalb/ncut hold the GIL in their
    numpy/scipy glue), threads on a single-core host (no parallelism to
    win; skips ~2 s/worker of spawn+import)."""
    ncpu = os.cpu_count() or 1
    if ncpu > 1:
        import multiprocessing as mp
        from concurrent.futures import ProcessPoolExecutor

        # Workers must NOT touch the accelerator. The initializer alone is
        # too late for eager per-interpreter device registration hooks
        # (sitecustomize runs before it), so clear the gate in the parent's
        # env — children inherit it at spawn; the parent's already-running
        # backend is unaffected.
        os.environ["PALLAS_AXON_POOL_IPS"] = ""
        # Use the whole host: v5e-8 VMs ship 200+ vCPUs and the host cues
        # are the pipeline's throughput bound (BASELINE.md full13 scaling
        # model). 128-worker cap bounds spawn+import cost (~2 s/worker,
        # amortized over a whole scene's views).
        return ProcessPoolExecutor(
            max_workers=min(128, ncpu),
            mp_context=mp.get_context("spawn"),
            initializer=_cpu_worker_init,
        )
    from concurrent.futures import ThreadPoolExecutor

    return ThreadPoolExecutor(max_workers=2)


def _host_cue_job(model_path, view, tasks, settings_kv, arrs,
                  dev_maps=None) -> None:
    """Process-pool entry: host cues for one view from in-memory arrays."""
    from types import SimpleNamespace

    host_cues_for_view(model_path, view, tasks,
                       SimpleNamespace(**settings_kv), arrs.__getitem__,
                       dev_maps=dev_maps)


def _host_cue_disk_job(model_path, view, tasks, settings_kv) -> None:
    """Process-pool entry: host cues for one view, inputs read from disk
    (the standalone `--task keypoints3d/segment_*` pass)."""
    from types import SimpleNamespace

    from ..cues.encode import load_png
    from ..sampling import file_name_for

    s = SimpleNamespace(**settings_kv)
    p, v = view["point_uuid"], view["view_id"]

    def get(task):
        return load_png(file_name_for(
            os.path.join(model_path, task), p, v, task, s.PREFERRED_IMG_EXT))

    host_cues_for_view(model_path, view, tasks, s, get)


def host_cues_for_view(model_path: str, view: dict, tasks, settings, get,
                       dev_maps=None) -> None:
    """Compute + write the per-view host cues (keypoints3d / segment_2d /
    segment_25d). `get(task)` returns the task's decoded image array — from
    disk (standalone host pass) or from the in-flight device batch (overlap
    path; reference counterpart: create_images_nonblender_utils.py:39-67
    process_view workers). dev_maps: optional device-computed per-view input
    maps — 'narf' (NARF border maps, narf_device.py; keypoints3d then runs
    only its region-growing interest stage), 'seg2d_q' / 'seg25d_q'
    (quantized blur/channel maps, seg_device.py; the segmentation cues then
    skip their host-side gaussians)."""
    from ..cues.encode import save_png
    from ..sampling import file_name_for

    dev_maps = dev_maps or {}
    p, v = view["point_uuid"], view["view_id"]
    out_path = lambda task: file_name_for(
        os.path.join(model_path, task), p, v, task, settings.PREFERRED_IMG_EXT
    )
    if "keypoints3d" in tasks:
        from ..cues.keypoints3d import keypoints3d_from_depth_code

        out = keypoints3d_from_depth_code(
            get("depth_zbuffer"), view["field_of_view_rads"],
            settings.RESOLUTION, support_size=settings.KEYPOINT_SUPPORT_SIZE,
            max_meters=settings.DEPTH_ZBUFFER_MAX_DISTANCE_METERS,
            border_maps=dev_maps.get("narf"),
        )
        save_png(out_path("keypoints3d"), out)
    if "segment_unsup2d" in tasks:
        from ..cues.segmentation import segment_2d

        blurred = None
        if "seg2d_q" in dev_maps:
            from ..cues.seg_device import seg2d_blurred_from_maps

            blurred = seg2d_blurred_from_maps(dev_maps["seg2d_q"])
        # keep uint8: felzenszwalb's img_as_float scaling depends on
        # the dtype (a float64 0-255 array would be double-scaled)
        labels = segment_2d(
            np.asarray(get("rgb")),
            scale=settings.SEGMENTATION_2D_SCALE,
            blur=settings.SEGMENTATION_2D_BLUR,
            cut_thresh=settings.SEGMENTATION_2D_CUT_THRESH,
            self_edge_weight=settings.SEGMENTATION_2D_SELF_EDGE_WEIGHT,
            blurred255=blurred,
        )
        save_png(out_path("segment_unsup2d"), labels.astype(np.uint8))
    if "segment_unsup25d" in tasks:
        from ..cues.segmentation import segment_25d

        input_img = None
        if "seg25d_q" in dev_maps:
            from ..cues.seg_device import seg25d_input_from_maps

            input_img = seg25d_input_from_maps(
                dev_maps["seg25d_q"],
                settings.SEGMENTATION_25D_DEPTH_WEIGHT,
                settings.SEGMENTATION_25D_NORMAL_WEIGHT,
                settings.SEGMENTATION_25D_EDGE_WEIGHT,
            )
        labels = segment_25d(
            get("depth_zbuffer"),
            None if input_img is not None else get("normal"),
            None if input_img is not None else get("edge_occlusion"),
            depth_weight=settings.SEGMENTATION_25D_DEPTH_WEIGHT,
            normal_weight=settings.SEGMENTATION_25D_NORMAL_WEIGHT,
            edge_weight=settings.SEGMENTATION_25D_EDGE_WEIGHT,
            scale=settings.SEGMENTATION_25D_SCALE,
            cut_thresh=settings.SEGMENTATION_25D_CUT_THRESH,
            self_edge_weight=settings.SEGMENTATION_25D_SELF_EDGE_WEIGHT,
            input_img=input_img,
        )
        save_png(out_path("segment_unsup25d"), labels.astype(np.uint8))


def run_host_tasks(model_path: str, tasks: list[str], settings) -> None:
    from ..cues.vanishing import vanishing_points
    from ..sampling import load_point_info, save_point_info

    infos = load_point_info(model_path)
    for t in tasks:
        if t != "vanishing_points":
            os.makedirs(os.path.join(model_path, t), exist_ok=True)

    cue_tasks = [t for t in tasks if t in HOST_CUE_TASKS]
    if cue_tasks:
        # parallel over views (the reference's multiprocessing.Pool,
        # create_images_nonblender_utils.py:39-67)
        kv = _host_cue_settings_kv(settings)
        with _make_host_cue_pool() as pool:
            futures = [
                pool.submit(_host_cue_disk_job, model_path, view,
                            tuple(cue_tasks), kv)
                for views in infos for view in views
            ]
            for f in futures:
                f.result()

    if "vanishing_points" in tasks:
        for views in infos:
            for view in views:
                img_vps, sphere_vps = vanishing_points(view, settings.RESOLUTION)
                view["vanishing_points_image"] = {
                    k: list(map(float, xy)) for k, xy in zip("xyz", img_vps)
                }
                view["vanishing_points_gaussian_sphere"] = {
                    k: list(map(float, p3)) for k, p3 in zip("xyz", sphere_vps)
                }
        save_point_info(model_path, infos)


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    # `with KEY=VAL ...` tail (the reference's settings vocabulary)
    overrides = []
    if "with" in argv:
        i = argv.index("with")
        overrides = argv[i + 1 :]
        argv = argv[:i]

    p = argparse.ArgumentParser(prog="omnidata-annotate")
    p.add_argument("--model_path", required=True)
    p.add_argument("--task", required=True,
                   help=f"one of {TASKS_ALL} or 'all'")
    args = p.parse_args(argv)

    from .settings import load_settings

    settings = load_settings(overrides)
    if settings.RESOLUTION_X or settings.RESOLUTION_Y:
        # reference RESOLUTION_X/Y aliases: only square renders supported
        rx = settings.RESOLUTION_X or settings.RESOLUTION_Y
        ry = settings.RESOLUTION_Y or settings.RESOLUTION_X
        if rx != ry:
            raise SystemExit(
                f"non-square renders unsupported (RESOLUTION_X={rx}, "
                f"RESOLUTION_Y={ry})"
            )
        from dataclasses import replace

        settings = replace(settings, RESOLUTION=rx)
    tasks = TASKS_ALL if args.task == "all" else [args.task]

    t0 = time.time()
    if "points" in tasks:
        run_points(args.model_path, settings)
    if args.task == "trajectory" or (settings.CREATE_TRAJECTORY and "points" in tasks):
        run_trajectory(args.model_path, settings)
    if args.task == "pano" or (settings.CREATE_PANOS and "points" in tasks):
        run_pano(args.model_path, settings)
    device = [t for t in tasks if t in DEVICE_TASKS]
    host = [t for t in tasks
            if t in HOST_CUE_TASKS + ("vanishing_points",)]
    # host cues whose device inputs are part of this run compute overlapped
    # with the device batches instead of a separate PNG-reloading pass
    deps = {
        "keypoints3d": {"depth_zbuffer"},
        "segment_unsup2d": {"rgb"},
        "segment_unsup25d": {"depth_zbuffer", "normal", "edge_occlusion"},
    }
    overlapped = tuple(
        t for t in host if t in deps and deps[t] <= set(device)
    )
    # RGB_MODEL_FILE / SEMANTIC_MODEL_FILE pick a different mesh for those
    # labels (reference: the rgb/semantic jobs load their own model files).
    # The rgb-derived cues (edge_texture/keypoints2d) ride with rgb's mesh.
    groups: list[tuple[list, str | None]] = []
    if getattr(settings, "RGB_MODEL_FILE", "") and len(device) > 1:
        g = [t for t in device if t in ("rgb", "edge_texture", "keypoints2d")]
        if g:
            device = [t for t in device if t not in g]
            groups.append((g, "rgb"))
    if getattr(settings, "SEMANTIC_MODEL_FILE", "") and "semantic" in device \
            and len(device) > 1:
        device.remove("semantic")
        groups.append((["semantic"], "semantic"))
    if device:
        groups.insert(0, (device, None))
    done_overlapped: set = set()
    for tasks_g, mesh_task in groups:
        overlapped_g = tuple(
            t for t in overlapped
            if t not in done_overlapped and deps[t] <= set(tasks_g)
        )
        run_device_tasks(args.model_path, tasks_g, settings,
                         host_tasks=overlapped_g, mesh_task=mesh_task)
        done_overlapped.update(overlapped_g)
    host = [t for t in host if t not in done_overlapped]
    if host:
        run_host_tasks(args.model_path, host, settings)
    print(f"[omnidata-annotate] done in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
