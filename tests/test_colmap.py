"""Tests for COLMAP model IO and conversion."""

import numpy as np
import pytest

from neat_tpu.colmap_tools.model_io import (
    Camera,
    Image,
    Point3D,
    read_model,
    write_model,
    qvec2rotmat,
    rotmat2qvec,
)
from neat_tpu.colmap_tools.convert import normalize_cameras, colmap_to_world_mats
from neat_tpu.colmap_tools.depth import read_array, write_array


def make_model():
    cams = {
        1: Camera(1, "PINHOLE", 640, 480, np.asarray([500.0, 490.0, 320.0, 240.0]))
    }
    q = np.asarray([0.9, 0.1, 0.2, 0.05])
    q = q / np.linalg.norm(q)
    imgs = {
        1: Image(
            1, q, np.asarray([0.1, -0.2, 2.0]), 1, "a.png",
            np.asarray([[1.0, 2.0], [3.0, 4.0]]), np.asarray([5, -1], np.int64),
        ),
        2: Image(
            2, np.asarray([1.0, 0, 0, 0]), np.asarray([0.0, 0.0, 3.0]), 1, "b.png",
            np.zeros((0, 2)), np.zeros((0,), np.int64),
        ),
    }
    pts = {
        5: Point3D(
            5, np.asarray([0.5, 0.6, 0.7]), np.asarray([255, 128, 0]), 0.3,
            np.asarray([1]), np.asarray([0]),
        )
    }
    return cams, imgs, pts


class TestModelIO:
    @pytest.mark.parametrize("ext", [".txt", ".bin"])
    def test_roundtrip(self, tmp_path, ext):
        cams, imgs, pts = make_model()
        write_model(cams, imgs, pts, str(tmp_path), ext=ext)
        c2, i2, p2 = read_model(str(tmp_path), ext=ext)
        np.testing.assert_allclose(c2[1].params, cams[1].params)
        assert c2[1].model == "PINHOLE"
        np.testing.assert_allclose(i2[1].qvec, imgs[1].qvec, atol=1e-9)
        np.testing.assert_allclose(i2[1].tvec, imgs[1].tvec, atol=1e-9)
        assert i2[1].name == "a.png"
        np.testing.assert_allclose(i2[1].xys, imgs[1].xys)
        np.testing.assert_allclose(p2[5].xyz, pts[5].xyz)
        assert p2[5].image_ids.tolist() == [1]

    def test_qvec_roundtrip(self):
        q = np.asarray([0.9, 0.1, 0.2, 0.05])
        q = q / np.linalg.norm(q)
        r = qvec2rotmat(q)
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-10)
        q2 = rotmat2qvec(r)
        np.testing.assert_allclose(q2, q, atol=1e-8)

    def test_k_matrix(self):
        cams, _, _ = make_model()
        k = cams[1].K()
        assert k[0, 0] == 500 and k[1, 1] == 490 and k[0, 2] == 320


class TestConvert:
    def test_world_mats_and_normalize(self, tmp_path):
        cams, imgs, pts = make_model()
        write_model(cams, imgs, pts, str(tmp_path), ext=".bin")
        world_mats, intr, points = colmap_to_world_mats(str(tmp_path))
        assert set(world_mats) == {"a.png", "b.png"}
        # P = K [R|t]: verify a projected 3D point matches manual compute
        p = world_mats["a.png"]
        w2c = imgs[1].world2cam()
        k4 = np.eye(4)
        k4[:3, :3] = cams[1].K()
        np.testing.assert_allclose(p, (k4 @ w2c), atol=1e-8)

        sm = normalize_cameras(world_mats, points=None)
        assert sm.shape == (4, 4)
        assert sm[0, 0] > 0


class TestDepthIO:
    def test_array_roundtrip(self, tmp_path):
        arr = np.random.RandomState(0).rand(12, 17).astype(np.float32)
        p = str(tmp_path / "depth.bin")
        write_array(p, arr)
        out = read_array(p)
        np.testing.assert_allclose(out, arr, rtol=1e-6)


class TestImagesBinLayout:
    def test_point2d_record_is_ddq(self, tmp_path):
        """COLMAP's images.bin point2D record is x (d), y (d),
        POINT3D_ID (q = int64). Reading the id as a double silently
        corrupts every id (incl. the -1 invalid marker and ids beyond
        2^53); pin the byte layout against a hand-packed file."""
        import struct

        from neat_tpu.colmap_tools.model_io import (
            Image,
            _read_images_bin,
            _write_images_bin,
        )

        big_id = (1 << 60) + 3  # not representable as a float64
        path = tmp_path / "images.bin"
        with open(path, "wb") as f:
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<i", 7))
            f.write(struct.pack("<4d", 1.0, 0.0, 0.0, 0.0))
            f.write(struct.pack("<3d", 0.1, 0.2, 0.3))
            f.write(struct.pack("<i", 1))
            f.write(b"img.png\x00")
            f.write(struct.pack("<Q", 2))
            f.write(struct.pack("<ddq", 10.5, 20.5, big_id))
            f.write(struct.pack("<ddq", 1.0, 2.0, -1))

        images = _read_images_bin(path)
        im = images[7]
        assert im.point3D_ids[0] == big_id
        assert im.point3D_ids[1] == -1
        np.testing.assert_allclose(im.xys, [[10.5, 20.5], [1.0, 2.0]])

        # write-back is byte-identical
        out = tmp_path / "rt.bin"
        _write_images_bin(images, out)
        assert out.read_bytes() == path.read_bytes()


class TestVis:
    def test_plot_reconstruction(self, tmp_path):
        """Headless vis_3d equivalent renders points + frusta to png."""
        from neat_tpu.colmap_tools.model_io import write_model
        from neat_tpu.colmap_tools.vis import plot_reconstruction

        cams, imgs, pts = make_model()
        write_model(cams, imgs, pts, str(tmp_path), ext=".bin")
        out = tmp_path / "recon.png"
        stats = plot_reconstruction(str(tmp_path), str(out), min_track_len=1)
        assert out.exists() and out.stat().st_size > 1000
        assert stats["n_cameras"] == 2 and stats["n_points"] == 1
