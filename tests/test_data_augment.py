"""Tests for the data layer (transforms, dataset index, download tooling,
masks) and augmentations (refocus physics, rgb aug cascade, resize/crop)."""
import os
import tarfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnidata_tpu.augment import (
    augment_rgb,
    compute_quantile_membership,
    compute_quantiles,
    refocus_augmentation,
    refocus_image,
    resize_crop,
    separable_gaussian,
)
from omnidata_tpu.data.dataset import OmnidataDataset, Options
from omnidata_tpu.data.download import (
    OmnidataMetadata,
    TaskonomyMetadata,
    ZippedModel,
    filter_models,
    md5sum,
    process_model,
)
from omnidata_tpu.data.masks import build_mask, dilate_invalid
from omnidata_tpu.data.transforms import default_loader, get_transform


# ---------------- transforms ----------------

def test_transform_16bit(tmp_path):
    from PIL import Image

    arr = (np.arange(64, dtype=np.uint16).reshape(8, 8) * 1000)
    p = str(tmp_path / "d.png")
    Image.fromarray(arr).save(p)
    img = default_loader(p)
    out = get_transform("depth_euclidean")(img)
    assert out.shape == (1, 8, 8)
    # 16-bit scale then clamp_to (0, 8000/65535) rescale -> 1000/8000
    np.testing.assert_allclose(out[0, 0, 1], 1000 / 8000, atol=1e-6)
    out2 = get_transform("keypoints2d")(img)
    np.testing.assert_allclose(out2[0, 0, 1], 1000 / 65535, atol=1e-6)


def test_transform_clamp_edge_texture():
    arr = np.full((4, 4), 65535, np.uint16)
    out = get_transform("edge_texture")(arr)
    # 1.0 clamped to 0.25 then rescaled -> 1.0
    np.testing.assert_allclose(out, 1.0)


def test_transform_curvature_crops_channels():
    rgb = np.zeros((4, 4, 3), np.uint8)
    out = get_transform("principal_curvature")(rgb)
    assert out.shape == (2, 4, 4)


def test_masks():
    t = jnp.ones((1, 1, 8, 8))
    t = t.at[0, 0, 4, 4].set(0.0)
    m = build_mask(t, val=0.0, max_pool_size=3)
    assert not bool(m[0, 0, 4, 4])
    assert not bool(m[0, 0, 3, 4])  # dilated
    assert bool(m[0, 0, 0, 0])
    m2 = dilate_invalid(jnp.asarray(m), 3)
    assert int((~m2).sum()) > int((~m).sum())
    # tolerance band: 8-bit sentinels never equal the registry value exactly
    # (normal's 0.502 is 128/255 on disk; reference masks.py:14 uses ±1e-3)
    t3 = jnp.full((1, 3, 8, 8), 128.0 / 255.0)
    t3 = t3.at[0, :, 0, 0].set(0.9)
    m3 = build_mask(t3, val=0.502, max_pool_size=1)
    assert bool(m3[0, 0, 0, 0]) and not bool(m3[0, 0, 4, 4])


def test_make_valid_mask_strided_tiles():
    """Reference make_valid_mask semantics (train_*.py:215-242): a strided
    max_pool_size² TILE containing any invalid pixel is wholly invalid —
    NOT a stride-1 window (which would invalidate a 2x wider band)."""
    from omnidata_tpu.data.masks import make_valid_mask

    mv = np.ones((1, 1, 8, 8), bool)
    mv[0, 0, 5, 5] = False  # inside the (4:8, 4:8) tile
    got = np.asarray(make_valid_mask(jnp.asarray(mv), 4))
    assert not got[0, 0, 4:8, 4:8].any()  # whole tile invalid
    assert got[0, 0, :4, :].all() and got[0, 0, 4:, :4].all()  # others valid


# ---------------- dataset ----------------

@pytest.fixture()
def fake_dataset_root(tmp_path):
    from PIL import Image

    rng = np.random.RandomState(0)
    root = tmp_path / "building1"
    for task, dtype in [("rgb", np.uint8), ("normal", np.uint8), ("depth_zbuffer", np.uint16)]:
        d = root / task
        d.mkdir(parents=True)
        for p in range(2):
            for v in range(3):
                if task == "depth_zbuffer":
                    arr = rng.randint(0, 65535, (16, 16)).astype(np.uint16)
                    img = Image.fromarray(arr)
                else:
                    img = Image.fromarray(
                        rng.randint(0, 255, (16, 16, 3), np.uint8)
                    )
                img.save(d / f"point_{p}_view_{v}_domain_{task}.png")
    # an incomplete bpv (missing depth) must be excluded
    Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(
        root / "rgb" / "point_9_view_0_domain_rgb.png"
    )
    return tmp_path


def test_dataset_index_and_getitem(fake_dataset_root):
    ds = OmnidataDataset(
        Options(
            data_path=str(fake_dataset_root),
            tasks=("rgb", "normal", "depth_zbuffer"),
            random_flip=False,
        )
    )
    assert len(ds) == 6  # 2 points x 3 views, incomplete bpv dropped
    s = ds[0]
    assert s["rgb"].shape == (3, 16, 16)
    assert s["depth_zbuffer"].shape == (1, 16, 16)


def test_dataset_multiview(fake_dataset_root):
    ds = OmnidataDataset(
        Options(
            data_path=str(fake_dataset_root),
            tasks=("rgb",),
            num_positive=2,
            random_flip=False,
        )
    )
    s = ds[0]
    assert s["rgb"].shape == (2, 3, 16, 16)


def test_dataset_flip_normal_x(fake_dataset_root):
    o = Options(
        data_path=str(fake_dataset_root), tasks=("normal",), random_flip=True, seed=3
    )
    ds = OmnidataDataset(o)
    ds.rng = np.random.RandomState(100)  # force flip draw deterministic
    # draw until we see a flip and verify x-channel inversion
    raw = OmnidataDataset(
        Options(data_path=str(fake_dataset_root), tasks=("normal",), random_flip=False)
    )[0]["normal"]
    for _ in range(20):
        s = ds[0]["normal"]
        if not np.allclose(s, raw):
            np.testing.assert_allclose(s, np.concatenate(
                [1.0 - raw[:1, :, ::-1], raw[1:, :, ::-1]]), atol=1e-6)
            return
    pytest.fail("flip never triggered")


def test_dataset_batches(fake_dataset_root):
    ds = OmnidataDataset(
        Options(data_path=str(fake_dataset_root), tasks=("rgb",), random_flip=False)
    )
    batches = list(ds.batches(2, shuffle=False))
    assert len(batches) == 3
    assert batches[0]["rgb"].shape == (2, 3, 16, 16)


# ---------------- download ----------------

def test_url_parsers():
    om = OmnidataMetadata("https://x.test/omnidata/", ".tar")
    m = om.parse("https://x.test/omnidata/omnidata_tars/depth_euclidean/blendedMVS/depth_euclidean-blendedMVS-000000.tar")
    assert (m.component_name, m.domain, m.model_name) == (
        "blendedMVS", "depth_euclidean", "000000",
    )
    with pytest.raises(ValueError):
        om.parse("https://x.test/omnidata/omnidata_tars/depth/blendedMVS/normal-blendedMVS-0.tar")

    tk = TaskonomyMetadata("https://x.test/taskonomy/")
    m2 = tk.parse("https://x.test/taskonomy/adairsville_class_object.tar")
    assert (m2.component_name, m2.model_name, m2.domain) == (
        "taskonomy", "adairsville", "class_object",
    )


def test_filter_models_and_striping():
    models = [
        ZippedModel("replica", "rgb", f"m{i}", f"u{i}") for i in range(10)
    ] + [ZippedModel("taskonomy", "normal", "t0", "u")]
    f = filter_models(models, ["rgb"], "all", "all", ["replica"])
    assert len(f) == 10
    assert len(f[1::3]) == 3  # striping slice semantics


def test_process_model_roundtrip(tmp_path):
    # build a local tar with the expected domain/component/model structure
    src = tmp_path / "stage" / "rgb" / "replica" / "frl0"
    src.mkdir(parents=True)
    (src / "point_0_view_0_domain_rgb.png").write_bytes(b"fakepng")
    tar_path = tmp_path / "rgb__replica__frl0.tar"
    with tarfile.open(tar_path, "w") as tf:
        tf.add(tmp_path / "stage" / "rgb", arcname="rgb")

    model = ZippedModel(
        "replica", "rgb", "frl0", f"file://{tar_path}",
        checksum=md5sum(str(tar_path)),
    )
    dest = tmp_path / "out"
    dest_c = tmp_path / "tars"
    dest.mkdir(), dest_c.mkdir()
    ok = process_model(model, str(dest), str(dest_c))
    assert ok
    extracted = dest / "rgb" / "replica" / "frl0" / "point_0_view_0_domain_rgb.png"
    assert extracted.exists()
    # idempotent skip
    assert process_model(model, str(dest), str(dest_c))
    # checksum failure path
    bad = ZippedModel("replica", "rgb", "frl1", f"file://{tar_path}", checksum="0" * 32)
    errors = []
    assert not process_model(bad, str(dest), str(dest_c), max_tries=1, errors=errors)
    assert errors


def test_aria2_rpc_client_against_fake_daemon(tmp_path):
    """Drive Aria2RPC's full addUri/tellStatus protocol against an in-process
    JSON-RPC server that mimics aria2 (serves file:// URIs, checks the
    md5 option server-side like the real daemon's --check-integrity)."""
    import hashlib
    import json as jsonlib
    import shutil as shutil_mod
    import threading
    import urllib.request as _url
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from omnidata_tpu.data.aria2_rpc import Aria2RPC

    jobs = {}

    class FakeAria2(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_POST(self):
            req = jsonlib.loads(
                self.rfile.read(int(self.headers["Content-Length"])))
            method, params = req["method"], req.get("params", [])
            if method == "aria2.getVersion":
                result = {"version": "fake"}
            elif method == "aria2.addUri":
                (uri,), opts = params[0], params[1]
                gid = f"g{len(jobs)}"
                dest = os.path.join(opts["dir"], opts["out"])
                try:
                    with _url.urlopen(uri) as r, open(dest, "wb") as fh:
                        shutil_mod.copyfileobj(r, fh)
                    want = opts.get("checksum", "")
                    got = "md5=" + hashlib.md5(
                        open(dest, "rb").read()).hexdigest()
                    if want and want != got:
                        jobs[gid] = {"status": "error",
                                     "errorMessage": "checksum mismatch"}
                    else:
                        jobs[gid] = {"status": "complete"}
                except Exception as e:  # noqa: BLE001
                    jobs[gid] = {"status": "error", "errorMessage": str(e)}
                result = gid
            elif method == "aria2.tellStatus":
                result = jobs[params[0]]
            else:
                result = None
            body = jsonlib.dumps(
                {"jsonrpc": "2.0", "id": req["id"], "result": result}).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    srv = HTTPServer(("localhost", 0), FakeAria2)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        client = Aria2RPC(port=srv.server_address[1])
        assert client.alive()

        src = tmp_path / "payload.bin"
        src.write_bytes(b"tar bytes here")
        dest = tmp_path / "fetched" / "payload.bin"
        client.download(f"file://{src}", str(dest),
                        checksum=md5sum(str(src)))
        assert dest.read_bytes() == b"tar bytes here"

        # server-side checksum rejection surfaces as IOError
        with pytest.raises(IOError, match="checksum"):
            client.download(f"file://{src}", str(tmp_path / "bad.bin"),
                            checksum="0" * 32)
    finally:
        srv.shutdown()


def test_download_file_routes_through_rpc_daemon(tmp_path, monkeypatch):
    """use_aria2=True must prefer the persistent daemon and pass the md5
    through for server-side verification."""
    import omnidata_tpu.data.aria2_rpc as rpc
    import omnidata_tpu.data.download as dl

    calls = []

    class FakeClient:
        def download(self, url, dest, checksum=None, **kw):
            calls.append((url, dest, checksum))
            open(dest, "wb").write(b"via-rpc")

    monkeypatch.setattr(rpc, "ensure_daemon", lambda **kw: FakeClient())
    dest = tmp_path / "d" / "f.tar"
    dl.download_file("http://x.test/f.tar", str(dest), use_aria2=True,
                     checksum="a" * 32)
    assert calls == [("http://x.test/f.tar", str(dest), "a" * 32)]
    assert dest.read_bytes() == b"via-rpc"


def test_aria2_ensure_daemon_absent(monkeypatch):
    """Without an aria2c binary, ensure_daemon declines and download_file
    falls back to urllib."""
    import omnidata_tpu.data.aria2_rpc as rpc

    monkeypatch.setattr(rpc, "_DAEMON", None)
    monkeypatch.setattr(rpc.shutil, "which", lambda _: None)
    assert rpc.ensure_daemon() is None


# ---------------- augment ----------------

def test_separable_gaussian_identity_and_blur():
    img = jnp.zeros((1, 1, 31, 31)).at[0, 0, 15, 15].set(1.0)
    out_id = separable_gaussian(img, jnp.asarray(0.0), max_cutoff=11)
    np.testing.assert_allclose(out_id, img, atol=1e-6)
    out = separable_gaussian(img, jnp.asarray(2.0), max_cutoff=21)
    assert float(out[0, 0, 15, 15]) < 1.0
    np.testing.assert_allclose(float(out.sum()), 1.0, atol=1e-5)


def test_quantile_membership():
    depth = jnp.linspace(1.0, 2.0, 16).reshape(1, 1, 4, 4)
    qv = compute_quantiles(depth, 4)
    dl, dr, il, ir = compute_quantile_membership(depth, qv)
    assert (np.asarray(il) >= 0).all() and (np.asarray(ir) <= 4).all()
    np.testing.assert_allclose(np.asarray(dl) + np.asarray(dr), 1.0, atol=1e-5)


def test_refocus_keeps_focus_plane_sharp():
    rng = np.random.RandomState(0)
    rgb = jnp.asarray(rng.rand(1, 3, 32, 32).astype(np.float32))
    # two-plane depth: near half at 1m, far half at 10m
    depth = jnp.concatenate(
        [jnp.full((1, 1, 32, 16), 1.0), jnp.full((1, 1, 32, 16), 10.0)], -1
    )
    qv = compute_quantiles(depth, 4)
    focus = jnp.full((1, 1), 1.0)
    aperture = jnp.full((1, 1), 3.0)
    out = refocus_image(rgb, depth, focus, aperture, qv, max_cutoff=31)
    assert out.shape == rgb.shape
    near_err = float(jnp.abs(out[..., :, :14] - rgb[..., :, :14]).mean())
    far_err = float(jnp.abs(out[..., :, 18:] - rgb[..., :, 18:]).mean())
    assert near_err < 0.02  # in-focus plane nearly unchanged
    assert far_err > near_err * 2  # defocused plane visibly blurred


def test_refocus_augmentation_runs():
    rgb = jnp.ones((2, 3, 16, 16)) * 0.5
    depth = jnp.ones((2, 1, 16, 16)) + jnp.linspace(0, 1, 16)[None, None, None]
    out = refocus_augmentation(rgb, depth, jax.random.PRNGKey(0), n_quantiles=4,
                               max_cutoff=15)
    assert out.shape == rgb.shape
    assert np.isfinite(np.asarray(out)).all()


def test_augment_rgb_and_resize_crop():
    rgb = jnp.asarray(np.random.RandomState(1).rand(2, 3, 32, 32), jnp.float32)
    out = augment_rgb(rgb, jax.random.PRNGKey(0))
    assert out.shape == rgb.shape and float(out.min()) >= 0
    batch = {"rgb": rgb, "depth": jnp.ones((2, 1, 32, 32))}
    small = resize_crop(batch, jax.random.PRNGKey(1), 16)
    assert small["rgb"].shape == (2, 3, 16, 16)
    big = resize_crop(batch, jax.random.PRNGKey(2), 64)
    assert big["depth"].shape == (2, 1, 64, 64)


# ---------------- scene metadata / multiview ----------------

def _toy_point_infos():
    mk = lambda p, v, loc, nonfix: {
        "point_uuid": str(p), "view_id": v, "camera_location": loc,
        "nonfixated_points_in_view": nonfix,
    }
    return [
        [mk(0, 0, [0, 0, 1], [1]), mk(0, 1, [1, 0, 1], [1, 2])],
        [mk(1, 0, [0, 0, 1], [0]), mk(1, 1, [5, 5, 1], [])],
        [mk(2, 0, [2, 2, 1], [0, 1])],
    ]


def test_building_metadata_dedup_and_hdf5(tmp_path):
    from omnidata_tpu.data import BuildingMetadata

    b = BuildingMetadata.from_point_info(_toy_point_infos())
    # two views share camera location [0,0,1] -> deduped
    assert b.camera_locations.shape[0] == 4
    p = str(tmp_path / "b.hdf5")
    b.save_hdf5(p)
    b2 = BuildingMetadata.load_hdf5(p)
    np.testing.assert_array_equal(b.camera_idx, b2.camera_idx)
    assert b.points == b2.points


def test_center_visible_sampler(tmp_path):
    from omnidata_tpu.data import (
        BuildingMetadata,
        BuildingMultiviewMetadata,
        CenterVisibleMultiviewSampler,
    )

    infos = _toy_point_infos()
    b = BuildingMetadata.from_point_info(infos)
    mv = BuildingMultiviewMetadata.from_point_info(infos)
    p = str(tmp_path / "mv.hdf5")
    mv.save_hdf5(p)
    mv2 = BuildingMultiviewMetadata.load_hdf5(p)
    assert mv.visible[("0", 1)] == mv2.visible[("0", 1)]

    s = CenterVisibleMultiviewSampler(b, mv)
    pos = s.positives("1", 0, 2, hops=1, rng=np.random.RandomState(0))
    # views that see point 1: (0,0), (0,1) and (2,0)
    assert set(pos) <= {("0", 0), ("0", 1), ("2", 0)}
    # backoff fills when not enough center-visible candidates
    pos4 = s.positives("1", 0, 4, hops=1, rng=np.random.RandomState(0))
    assert len(pos4) == 4


def test_splits_csv(tmp_path):
    from omnidata_tpu.data import flat_split_to_spaces, get_splits, subset_ladder

    p = tmp_path / "split.csv"
    p.write_text("id,train,val,test\nb1,1,0,0\nb2,0,1,0\nb3,1,0,0\nmosquito,1,0,0\n")
    s = get_splits(str(p))
    assert s["train"] == {"b1", "b3"} and s["val"] == {"b2"}
    subs = subset_ladder(["b1", "b2", "b3"])
    assert subs["debug"] <= subs["fullplus"]
    flat = flat_split_to_spaces(s, subs)
    assert "tiny-train" in flat


def test_segment_instance_helpers():
    from omnidata_tpu.data import (
        extract_instance_masks,
        fragments_to_instances,
        masks_to_bboxes,
        overlay_instances,
        random_colors,
    )

    labels = np.zeros((8, 8), np.int32)
    labels[1:3, 1:4] = 5
    labels[5:8, 5:8] = 9
    ids, masks = extract_instance_masks(labels)
    np.testing.assert_array_equal(ids, [5, 9])
    bb = masks_to_bboxes(masks)
    np.testing.assert_array_equal(bb[0], [1, 1, 3, 4])
    cols = random_colors(5)
    assert cols.shape == (5, 3) and len(np.unique(cols, axis=0)) == 5
    face_ids = np.array([[0, 1], [2, -1]])
    f2i = np.array([7, 7, 8])
    inst = fragments_to_instances(face_ids, f2i)
    np.testing.assert_array_equal(inst, [[7, 7], [8, 0]])
    rgb = np.zeros((8, 8, 3), np.uint8)
    out = overlay_instances(rgb, labels)
    assert out[2, 2].sum() > 0 and out[0, 0].sum() == 0


def test_component_registry(fake_dataset_root):
    from omnidata_tpu.data import COMPONENTS, make_component_dataset, normal_world_to_cam

    assert COMPONENTS["hypersim"].random_crop
    ds = make_component_dataset(
        "replica", str(fake_dataset_root),
        tasks=("rgb", "normal", "depth_zbuffer"), random_flip=False,
    )
    assert len(ds) == 6
    with pytest.raises(KeyError):
        make_component_dataset("nope", ".")
    # world->cam normal rotation roundtrips with identity
    n = np.random.RandomState(0).rand(3, 4, 4).astype(np.float32)
    np.testing.assert_allclose(normal_world_to_cam(n, np.eye(3)), n, atol=1e-6)


def test_overlap_multiview_sampler():
    from omnidata_tpu.data import OverlapMultiviewSampler

    f1 = np.arange(16).reshape(4, 4)            # faces 0..15
    f2 = np.arange(8, 24).reshape(4, 4)         # overlap 8..15 (50%)
    f3 = np.full((4, 4), 100)                   # no overlap
    frag = {("0", 0): f1, ("0", 1): f2, ("1", 0): f3}
    s = OverlapMultiviewSampler(frag, min_overlap_prop=0.25, max_views=4)
    pos = s.positives("0", 0, 2)
    assert pos[0] == ("0", 1)      # the overlapping view ranks first
    assert pos[1] == ("0", 0)      # backoff fills with SAME
    assert s.positives("1", 0, 1) == [("1", 0)]  # isolated view backs off


# ---------------- square crop / split / pose (round 2) ----------------

@pytest.fixture()
def nonsquare_root(tmp_path):
    """Two buildings with non-square (24x16 portrait) sources + point_info."""
    import json

    from PIL import Image

    rng = np.random.RandomState(3)
    for b in ("alpha", "beta"):
        root = tmp_path / b
        for task in ("rgb", "normal"):
            d = root / task
            d.mkdir(parents=True)
            for p in range(2):
                for v in range(2):
                    img = Image.fromarray(rng.randint(0, 255, (24, 16, 3), np.uint8))
                    img.save(d / f"point_{p}_view_{v}_domain_{task}.png")
        d = root / "point_info"
        d.mkdir(parents=True)
        for p in range(2):
            for v in range(2):
                info = {
                    "camera_location": [1.0, 2.0, 3.0],
                    "camera_rotation_final": [1.2, -0.3, 0.8],
                    "field_of_view_rads": 1.0,
                }
                (d / f"point_{p}_view_{v}_domain_fixatedpose.json").write_text(
                    json.dumps(info)
                )
    return tmp_path


def test_dataset_nonsquare_center_crop_stacks(nonsquare_root):
    ds = OmnidataDataset(
        Options(
            data_path=str(nonsquare_root), tasks=("rgb", "normal"),
            image_size=8, random_flip=False,
        )
    )
    item = ds[0]
    assert item["rgb"].shape == (3, 8, 8)
    # center crop is deterministic: two loads agree
    np.testing.assert_array_equal(ds[0]["rgb"], item["rgb"])
    batch = next(ds.batches(4, shuffle=False))
    assert batch["rgb"].shape == (4, 3, 8, 8)  # non-square sources stack


def test_dataset_nonsquare_random_crop_joint(nonsquare_root):
    ds = OmnidataDataset(
        Options(
            data_path=str(nonsquare_root), tasks=("rgb", "normal"),
            image_size=8, random_flip=False, random_crop=True, seed=1,
        )
    )
    # offsets vary across draws...
    draws = [ds[0]["rgb"] for _ in range(8)]
    assert any(not np.array_equal(draws[0], d) for d in draws[1:])
    # ...but rgb and normal of ONE sample share the same crop window: the
    # sources are identical random images per (task), so cross-check shapes
    item = ds[1]
    assert item["rgb"].shape == item["normal"].shape == (3, 8, 8)


def test_dataset_split_csv_filters_buildings(nonsquare_root, tmp_path):
    csv_path = tmp_path / "split.csv"
    csv_path.write_text("id,train,val,test\nalpha,1,0,0\nbeta,0,1,0\n")
    tr = OmnidataDataset(
        Options(data_path=str(nonsquare_root), tasks=("rgb", "normal"),
                split="train", split_csv=str(csv_path), random_flip=False)
    )
    va = OmnidataDataset(
        Options(data_path=str(nonsquare_root), tasks=("rgb", "normal"),
                split="val", split_csv=str(csv_path), random_flip=False)
    )
    assert {e[0] for e in tr.index} == {"alpha"}
    assert {e[0] for e in va.index} == {"beta"}
    assert len(tr) == len(va) == 4


def test_pose_rtk_matches_reference_convention(nonsquare_root):
    """R from scipy intrinsic XZY euler; T/K from the P3D formulas
    (dataloader/omnidata_dataset.py:565-594)."""
    from scipy.spatial.transform import Rotation

    from omnidata_tpu.data.pose import cam_to_world_R_T_K

    info = {
        "camera_location": [1.0, 2.0, 3.0],
        "camera_rotation_final": [1.2, -0.3, 0.8],
        "field_of_view_rads": 1.0,
    }
    out = cam_to_world_R_T_K(info)
    ex, ey, ez = info["camera_rotation_final"]
    R = Rotation.from_euler(
        "XZY", [ex - np.pi / 2, -ey, -ez]
    ).as_matrix()
    np.testing.assert_allclose(out["cam_to_world_R"], R.T, atol=1e-6)
    T = np.array([-1.0, 3.0, 2.0])
    np.testing.assert_allclose(out["cam_to_world_T"], -(R @ T), atol=1e-6)
    K = out["proj_K"]
    t = np.tan(0.5)
    np.testing.assert_allclose(K[0, 0], 1 / t, rtol=1e-6)
    np.testing.assert_allclose(K[1, 1], 1 / t, rtol=1e-6)
    np.testing.assert_allclose(K[3, 2], 1.0)
    np.testing.assert_allclose(K @ np.array([0, 0, 512.0, 1.0]),
                               [0, 0, 512.0, 512.0], rtol=1e-4)
    np.testing.assert_allclose(
        out["proj_K_inv"] @ K[:3, :3], np.eye(3), atol=1e-5
    )


def test_dataset_attaches_pose_and_multiview_stacks(nonsquare_root):
    ds = OmnidataDataset(
        Options(
            data_path=str(nonsquare_root),
            tasks=("rgb", "point_info"),
            num_positive=2, random_flip=False,
        )
    )
    item = ds[0]
    assert item["cam_to_world_R"].shape == (2, 3, 3)
    assert item["proj_K"].shape == (2, 4, 4)
    assert item["proj_K_inv"].shape == (2, 3, 3)
    single = OmnidataDataset(
        Options(data_path=str(nonsquare_root), tasks=("rgb", "point_info"),
                random_flip=False)
    )[0]
    assert single["cam_to_world_T"].shape == (3,)


def test_prefetch_loader_matches_sequential():
    """PrefetchLoader yields the same batches as sequential assembly for a
    fixed seed, in order, and overlapped decode doesn't lose/duplicate."""
    from omnidata_tpu.data.loader import PrefetchLoader

    class Toy:
        def __len__(self):
            return 23

        def __getitem__(self, i):
            return {"x": np.full((2, 2), i, np.float32), "name": str(i)}

    ds = Toy()
    loader = PrefetchLoader(ds, batch_size=4, num_workers=4, drop_last=True)
    got = list(loader.epoch(seed=7))
    assert len(got) == len(loader) == 5
    order = np.arange(23)
    np.random.RandomState(7).shuffle(order)
    for bi, b in enumerate(got):
        want = order[bi * 4 : bi * 4 + 4]
        np.testing.assert_array_equal(b["x"][:, 0, 0], want.astype(np.float32))
        assert b["name"] == [str(i) for i in want]

    # errors surface to the consumer
    class Bad(Toy):
        def __getitem__(self, i):
            if i == 5:
                raise ValueError("boom")
            return super().__getitem__(i)

    loader = PrefetchLoader(Bad(), batch_size=4, num_workers=2)
    with pytest.raises(ValueError):
        list(loader.epoch(seed=0))


def test_load_building_mesh_cached(tmp_path):
    from omnidata_tpu.data.dataset import OmnidataDataset, Options
    from omnidata_tpu.mesh import cube
    from omnidata_tpu.utils.convert_mesh import write_ply

    b = tmp_path / "bldg1"
    (b / "rgb").mkdir(parents=True)
    from PIL import Image
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
        b / "rgb" / "point_0_view_0_domain_rgb.png")
    c = cube(size=1.0)
    write_ply(str(b / "mesh.ply"), np.asarray(c.vertices),
              np.asarray(c.faces[: c.num_faces]))
    ds = OmnidataDataset(Options(data_path=str(tmp_path), tasks=("rgb",)))
    m1 = ds.load_building_mesh("bldg1")
    m2 = ds.load_building_mesh("bldg1")
    assert m1 is m2  # cached
    assert m1.num_faces == 12
    with pytest.raises(FileNotFoundError):
        ds.load_building_mesh("nope")


def test_transform_fragment_reference_quirk():
    """Reference PNG fragments rotate the first column back to the end
    (dataloader/transforms.py move_last_row); our .npy face ids pass
    through untouched."""
    from PIL import Image

    from omnidata_tpu.data.transforms import transform_fragment

    arr = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    out = transform_fragment(Image.fromarray(arr))
    np.testing.assert_array_equal(out[:, -1], arr[:, 0])
    np.testing.assert_array_equal(out[:, :-1], arr[:, 1:])
    ours = np.arange(6, dtype=np.int32).reshape(2, 3)
    np.testing.assert_array_equal(transform_fragment(ours), ours)
