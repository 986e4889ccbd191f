"""Asset I/O: glTF / OBJ loaders and the scene-compile cache
(reference capability: Model.cpp import pipeline + assbin fast-reload)."""
import base64
import json
import math
import struct

import numpy as np
import jax.numpy as jnp

from pathtracing_tpu.scene.builder import SceneBuilder
from pathtracing_tpu.io import load_gltf, load_obj, save_scene, load_scene


def _tri_gltf(tmp_path, emissive=False, glb=False):
    """One textured triangle with full PBR metadata."""
    pos = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    nrm = np.asarray([[0, 0, 1]] * 3, np.float32)
    uv = np.asarray([[0, 0], [1, 0], [0, 1]], np.float32)
    idx = np.asarray([0, 1, 2], np.uint16)
    buf = pos.tobytes() + nrm.tobytes() + uv.tobytes() + idx.tobytes()
    # 1x1 white png
    from PIL import Image
    import io as _io
    b = _io.BytesIO()
    Image.new("RGB", (2, 2), (255, 128, 0)).save(b, "PNG")
    png = b.getvalue()
    buf2 = buf + png

    g = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0, "translation": [1.0, 2.0, 3.0]}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
            "indices": 3, "material": 0}]}],
        "materials": [{
            "pbrMetallicRoughness": {
                "baseColorFactor": [0.9, 0.8, 0.7, 1.0],
                "baseColorTexture": {"index": 0},
                "roughnessFactor": 0.4, "metallicFactor": 0.1},
            "alphaMode": "MASK", "alphaCutoff": 0.3,
            **({"emissiveFactor": [2.0, 2.0, 2.0]} if emissive else {}),
        }],
        "textures": [{"source": 0}],
        "images": [{"bufferView": 4, "mimeType": "image/png"}],
        "buffers": [{"byteLength": len(buf2)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 36},
            {"buffer": 0, "byteOffset": 72, "byteLength": 24},
            {"buffer": 0, "byteOffset": 96, "byteLength": 6},
            {"buffer": 0, "byteOffset": len(buf), "byteLength": len(png)},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3,
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 3,
             "type": "VEC3"},
            {"bufferView": 2, "componentType": 5126, "count": 3,
             "type": "VEC2"},
            {"bufferView": 3, "componentType": 5123, "count": 3,
             "type": "SCALAR"},
        ],
    }
    if glb:
        js = json.dumps(g).encode()
        js += b" " * (-len(js) % 4)
        bin_pad = buf2 + b"\x00" * (-len(buf2) % 4)
        body = (struct.pack("<III", 0x46546C67, 2, 0)
                + struct.pack("<II", len(js), 0x4E4F534A) + js
                + struct.pack("<II", len(bin_pad), 0x004E4942) + bin_pad)
        body = body[:8] + struct.pack("<I", len(body)) + body[12:]
        p = tmp_path / "tri.glb"
        p.write_bytes(body)
    else:
        g["buffers"][0]["uri"] = "data:application/octet-stream;base64," \
            + base64.b64encode(buf2).decode()
        p = tmp_path / "tri.gltf"
        p.write_text(json.dumps(g))
    return p


def test_gltf_loads_geometry_and_material(tmp_path):
    p = _tri_gltf(tmp_path)
    b = SceneBuilder()
    stats = load_gltf(p, b)
    assert stats["n_meshes"] == 1 and stats["n_textures"] >= 1
    b.add_uniform_inf_light((1, 1, 1))
    b.set_camera([1.3, 2.3, -1], [1.3, 2.3, 3], math.radians(45), (8, 8))
    scene, cam, meta = b.build()
    assert meta.n_tri == 1
    # node translation applied
    v = np.asarray(scene["tri_v"][0])
    np.testing.assert_allclose(v[0], [1, 2, 3], atol=1e-6)
    # material: MASK alpha mode with cutoff 0.3
    assert int(scene["mat_alpha_mode"][0]) == 2
    np.testing.assert_allclose(float(scene["mat_alpha_cutoff"][0]), 0.3)
    np.testing.assert_allclose(np.asarray(scene["mat_base"][0]),
                               [0.9, 0.8, 0.7], atol=1e-6)


def test_glb_emissive_becomes_area_light(tmp_path):
    p = _tri_gltf(tmp_path, emissive=True, glb=True)
    b = SceneBuilder()
    load_gltf(p, b)
    b.set_camera([0, 0, -1], [0, 0, 1], math.radians(45), (8, 8))
    scene, cam, meta = b.build()
    assert meta.n_lights >= 1  # per-triangle area light (Model.hpp:41-81)


def test_obj_with_mtl(tmp_path):
    (tmp_path / "m.mtl").write_text(
        "newmtl red\nKd 0.8 0.1 0.1\nNs 250\n"
        "newmtl glass\nKd 1 1 1\nNi 1.5\nd 0.2\n")
    (tmp_path / "tri.obj").write_text(
        "mtllib m.mtl\n"
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n"
        "vn 0 0 1\nvt 0 0\nvt 1 0\nvt 0 1\n"
        "usemtl red\nf 1/1/1 2/2/1 3/3/1\n"
        "usemtl glass\nf 2/2/1 4/1/1 3/3/1\n")
    b = SceneBuilder()
    stats = load_obj(tmp_path / "tri.obj", b)
    assert stats["n_tris"] == 2
    b.add_uniform_inf_light((1, 1, 1))
    b.set_camera([0.5, 0.5, -2], [0.5, 0.5, 0], math.radians(45), (8, 8))
    scene, cam, meta = b.build()
    assert meta.n_tri == 2 and meta.n_mat == 2
    # glass material inferred as dielectric (type 1, Model.cpp:239-278)
    types = set(np.asarray(scene["mat_type"]).tolist())
    assert 1 in types and 0 in types


def test_scene_cache_roundtrip(tmp_path):
    from pathtracing_tpu import scenes
    from pathtracing_tpu.integrators.path import RenderConfig
    from pathtracing_tpu.integrators.render import render_image

    scene, cam, meta = scenes.cornell_box(resolution=(16, 16))
    save_scene(tmp_path / "cornell.npz", scene, cam, meta)
    scene2, cam2, meta2 = load_scene(tmp_path / "cornell.npz")
    assert meta2 == meta
    cfg = RenderConfig(spp=1, max_depth=2)
    img1 = np.asarray(render_image(scene, cam, meta, cfg))
    img2 = np.asarray(render_image(scene2, cam2, meta2, cfg))
    np.testing.assert_array_equal(img1, img2)


def test_scene_cache_meta_hashable(tmp_path):
    """Loaded SceneMeta must stay hashable (it's a jit static arg) —
    json round-trips tuples as lists."""
    from pathtracing_tpu import scenes
    scene, cam, meta = scenes.furnace(resolution=(8, 8))
    save_scene(tmp_path / "f.npz", scene, cam, meta)
    _, _, meta2 = load_scene(tmp_path / "f.npz")
    assert hash(meta2) == hash(meta)
    assert meta2 == meta


def test_native_obj_parser_matches_python(tmp_path):
    """The C++ OBJ parser (native/obj_parser.cpp) must produce the exact
    same scene as the pure-Python path: same triangles, same group order,
    same materials/lights — including polygon fans, negative indices,
    mixed corner formats, and emissive MTL materials."""
    import pathtracing_tpu.io.obj as objmod
    import pathtracing_tpu.native.loader as nl
    from pathtracing_tpu.scene.builder import SceneBuilder

    if nl.native_parse_obj(__file__) is None and \
            nl._get_obj_lib() is None:        # no toolchain: nothing to test
        import pytest
        pytest.skip("native toolchain unavailable")

    (tmp_path / "m.mtl").write_text(
        "newmtl red\nKd 0.8 0.1 0.1\nNs 50\n"
        "newmtl glow\nKd 0.1 0.1 0.1\nKe 3.0 2.0 1.0\n")
    (tmp_path / "t.obj").write_text(
        "mtllib m.mtl\n"
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
        "vn 0 0 1\n"
        "usemtl red\n"
        "f 1/1/1 2/2/1 3/3/1 4/4/1\n"
        "f -4/-4/-1 -3/-3/-1 -2/-2/-1\n"
        "usemtl glow\n"
        "f 1//1 3//1 4//1\n"
        "f 2 3 4\n")

    def build(force_python):
        b = SceneBuilder()
        if force_python:
            orig = nl.native_parse_obj
            nl.native_parse_obj = lambda p: None
            try:
                stats = objmod.load_obj(tmp_path / "t.obj", b, scale=2.0)
            finally:
                nl.native_parse_obj = orig
        else:
            stats = objmod.load_obj(tmp_path / "t.obj", b, scale=2.0)
        return b, stats

    bp, sp = build(True)
    bn, sn = build(False)
    assert sp == sn == dict(n_tris=5, n_materials=2)
    for k in ("v", "n", "uv", "prop"):
        np.testing.assert_array_equal(np.asarray(bp._tri[k]),
                                      np.asarray(bn._tri[k]), err_msg=k)
    assert bp._mat["type"] == bn._mat["type"]
    assert len(bp._lights) == len(bn._lights)


def test_stale_cache_version_raises(tmp_path):
    """Old-format caches must be rejected loudly (the CLI rebuilds):
    v2 caches predate the degenerate-empty-AABB kernel tables."""
    import json
    import numpy as np
    from pathtracing_tpu.io import cache as cachemod
    from pathtracing_tpu import scenes
    import pytest

    scene, cam, meta = scenes.cornell_box(resolution=(16, 16))
    p = tmp_path / "old.npz"
    save_scene(p, scene, cam, meta)
    z = dict(np.load(p, allow_pickle=False))
    hdr = json.loads(bytes(z["header"]).decode())
    hdr["version"] = 2
    z["header"] = np.frombuffer(json.dumps(hdr).encode(), np.uint8)
    np.savez_compressed(p, **z)
    with pytest.raises(cachemod.StaleCacheError):
        load_scene(p)
