"""Native C++ OBJ loader: build, parity with the Python parser, Mesh.Load wiring."""

import numpy as np
import pytest

from stable_renderer_tpu import native
from stable_renderer_tpu.engine.mesh import Mesh, load_obj

OBJ = """
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vt 0 0
vt 1 0
vt 1 1
vt 0 1
vn 0 0 1
usemtl matA
f 1/1/1 2/2/1 3/3/1 4/4/1
usemtl matB
f 1/1/1 3/3/1 2/2/1
"""


@pytest.fixture
def obj_file(tmp_path):
    p = tmp_path / "quad.obj"
    p.write_text(OBJ)
    return p


def test_native_available():
    assert native.available(), "g++ toolchain expected in this image"


def test_native_matches_python_parser(obj_file):
    out = native.load_obj_native(obj_file)
    assert out is not None
    pos, uv, nrm, tris, tri_mat, names = out
    py = load_obj(obj_file)
    assert pos.shape == py.positions.shape == (4, 3)
    assert tris.shape == py.tris.shape == (3, 3)  # quad fan = 2 tris + 1
    np.testing.assert_allclose(pos, py.positions)
    np.testing.assert_allclose(uv, py.uvs)
    np.testing.assert_array_equal(tris, py.tris)
    np.testing.assert_array_equal(tri_mat, py.tri_material)
    assert names == ["matA", "matB"]
    assert tri_mat.tolist() == [0, 0, 1]


def test_mesh_load_uses_native(obj_file):
    mesh = Mesh.Load(obj_file)
    assert mesh.vertex_count == 4
    assert mesh.triangle_count == 3
    assert getattr(mesh, "material_names") == ["matA", "matB"]
    # normals came from the file
    np.testing.assert_allclose(mesh.normals[0], [0, 0, 1])


def test_native_negative_indices(tmp_path):
    p = tmp_path / "neg.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n")
    pos, uv, nrm, tris, tri_mat, names = native.load_obj_native(p)
    assert pos.shape == (3, 3)
    np.testing.assert_array_equal(tris, [[0, 1, 2]])
    assert tri_mat.tolist() == [-1]


def test_native_missing_file():
    with pytest.raises(FileNotFoundError):
        native.load_obj_native("/nonexistent/x.obj")
