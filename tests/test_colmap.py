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


class TestConvertGuards:
    def test_partial_registration_raises(self, tmp_path):
        """world_mat_i is positional over the sorted image-file list, so an
        image on disk that COLMAP failed to register must fail the npz
        export loudly instead of mis-pairing poses."""
        from neat_tpu.colmap_tools.convert import colmap_to_cameras_npz
        from neat_tpu.colmap_tools.model_io import write_model

        cams, imgs, pts = make_model()
        model = tmp_path / "model"
        model.mkdir()
        write_model(cams, imgs, pts, str(model), ext=".bin")
        image_dir = tmp_path / "images"
        image_dir.mkdir()
        for name in ("a.png", "b.png", "c.png"):  # c.png unregistered
            (image_dir / name).write_bytes(b"")
        with pytest.raises(RuntimeError, match="c.png"):
            colmap_to_cameras_npz(
                str(model), str(tmp_path / "cameras.npz"),
                image_dir=str(image_dir),
            )
        # matching sets export fine
        (image_dir / "c.png").unlink()
        colmap_to_cameras_npz(
            str(model), str(tmp_path / "cameras.npz"), image_dir=str(image_dir)
        )
        assert (tmp_path / "cameras.npz").exists()

    def test_normalize_covers_cameras(self):
        """With a sparse cloud tight around the origin but cameras far out,
        the scale must still bring the cameras inside camera_radius —
        otherwise the sampler's near/far budget never reaches the object."""
        from neat_tpu.colmap_tools.convert import normalize_cameras

        rng = np.random.default_rng(0)
        points = rng.normal(scale=0.5, size=(200, 3))
        # cameras on a shell of radius 40: K[R|t] with centers c -> t = -R c
        world_mats = {}
        for i in range(8):
            c = 40.0 * rng.normal(size=3)
            c /= np.linalg.norm(c) / 40.0
            p = np.eye(4)
            p[:3, :3] = 500.0 * np.eye(3)
            p[:3, 3] = -500.0 * c
            world_mats[f"{i}.png"] = p
        sm = normalize_cameras(world_mats, points=points, camera_radius=3.0)
        radius = sm[0, 0]
        center = sm[:3, 3]
        for p in world_mats.values():
            cam_c = -np.linalg.solve(p[:3, :3], p[:3, 3])
            assert np.linalg.norm((cam_c - center) / radius) <= 3.0 + 1e-6


class TestDepthUnprojection:
    def test_pixel_center_convention(self):
        """Rays go through pixel CENTERS (x+0.5, y+0.5) like COLMAP's own
        fusion: a point projected at a pixel center must unproject back
        to itself."""
        from neat_tpu.colmap_tools.depth import depth_to_points

        k = np.array([[100.0, 0, 32.0], [0, 100.0, 24.0], [0, 0, 1.0]])
        depth = np.zeros((48, 64), np.float64)
        # pixel (x=10, y=7) center -> cam ray ((10.5-32)/100, (7.5-24)/100, 1)
        depth[7, 10] = 2.0
        pts = depth_to_points(depth, k, np.eye(4))
        assert pts.shape == (1, 3)
        expect = np.array([(10.5 - 32.0) / 100, (7.5 - 24.0) / 100, 1.0]) * 2.0
        np.testing.assert_allclose(pts[0], expect, atol=1e-12)


class TestBookkeepingTools:
    """tools/near_view.py (reference code/tools/near_view.py) and
    tools/commit.py (reference code/tools/commit.py + the runner's
    gitpython auto-commits)."""

    def test_near_view_covisibility_ranking(self, tmp_path, capsys):
        import sys

        sys.path.insert(0, "tools")
        from near_view import covisibility

        cams, imgs, pts = make_model()
        # three points: two shared by (1,2), one seen only by image 1
        pts = {
            5: Point3D(5, np.asarray([0.5, 0.6, 0.7]),
                       np.asarray([255, 128, 0]), 0.3,
                       np.asarray([1, 2]), np.asarray([0, 0])),
            6: Point3D(6, np.asarray([0.1, 0.2, 0.3]),
                       np.asarray([0, 0, 0]), 0.1,
                       np.asarray([1, 2]), np.asarray([0, 0])),
            7: Point3D(7, np.asarray([0.9, 0.9, 0.9]),
                       np.asarray([0, 0, 0]), 0.1,
                       np.asarray([1]), np.asarray([0])),
        }
        write_model(cams, imgs, pts, str(tmp_path), ext=".bin")
        ranked = covisibility(str(tmp_path), top_k=5)
        assert ranked == [((1, 2), 2)]
        out = capsys.readouterr().out
        assert "a.png <-> b.png: 2 shared points" in out

    def test_commit_experiment_snapshot(self, tmp_path):
        import subprocess
        import sys

        sys.path.insert(0, "tools")
        from commit import commit_experiment, git

        repo = tmp_path / "exps"
        rundir = repo / "tiny" / "2020_01_01"
        rundir.mkdir(parents=True)
        subprocess.run(["git", "init", "-q", str(repo)], check=True)
        (rundir / "runconf.conf").write_text("train { expname = tiny }\n")
        (rundir / "train.log").write_text("epoch 0\n")
        (repo / "unrelated.txt").write_text("must not be committed\n")

        commit_experiment(str(rundir))

        author = git(str(repo), "log", "-1", "--format=%an")
        assert author == "expbot"
        files = git(str(repo), "show", "--name-only", "--format=").splitlines()
        assert sorted(f.split("/")[-1] for f in files if f) == [
            "runconf.conf", "train.log",
        ]
        status = git(str(repo), "status", "--porcelain")
        assert "unrelated.txt" in status  # untouched


class TestKnownPoseDatabase:
    """COLMAP sqlite injection (reference colmap/abc.py, colmap/dtu.py)."""

    def test_pair_id_roundtrip(self):
        from neat_tpu.colmap_tools.database import (
            image_ids_to_pair_id,
            pair_id_to_image_ids,
        )

        assert pair_id_to_image_ids(image_ids_to_pair_id(3, 7)) == (3, 7)
        # order-insensitive: COLMAP stores the sorted pair
        assert image_ids_to_pair_id(7, 3) == image_ids_to_pair_id(3, 7)

    def test_build_known_pose_db(self, tmp_path):
        import sqlite3

        from neat_tpu.colmap_tools.database import build_known_pose_db
        from neat_tpu.colmap_tools.model_io import qvec2rotmat

        k = np.array([[500.0, 0, 320], [0, 490.0, 240], [0, 0, 1]])
        w2c = np.eye(4)
        w2c[:3, :3] = qvec2rotmat(
            np.asarray([0.9, 0.1, 0.2, 0.05])
            / np.linalg.norm([0.9, 0.1, 0.2, 0.05])
        )
        w2c[:3, 3] = [0.1, -0.2, 2.0]
        db_path = tmp_path / "db.db"
        ids = build_known_pose_db(
            str(db_path),
            {"a.png": k, "b.png": k},
            {"a.png": w2c, "b.png": np.eye(4)},
            640, 480,
        )
        assert sorted(ids) == ["a.png", "b.png"]

        con = sqlite3.connect(db_path)
        cams = con.execute(
            "SELECT model, width, height, params, prior_focal_length "
            "FROM cameras"
        ).fetchall()
        assert len(cams) == 2
        model, width, height, params, prior_f = cams[0]
        assert (model, width, height, prior_f) == (1, 640, 480, 1)  # PINHOLE
        np.testing.assert_allclose(
            np.frombuffer(params, np.float64), [500.0, 490.0, 320.0, 240.0]
        )
        name, qw, qx, qy, qz, tx, ty, tz = con.execute(
            "SELECT name, prior_qw, prior_qx, prior_qy, prior_qz, "
            "prior_tx, prior_ty, prior_tz FROM images WHERE name='a.png'"
        ).fetchone()
        # the stored prior reproduces the injected world2cam pose
        np.testing.assert_allclose(
            qvec2rotmat(np.asarray([qw, qx, qy, qz])), w2c[:3, :3], atol=1e-12
        )
        np.testing.assert_allclose([tx, ty, tz], w2c[:3, 3])
        con.close()

    def test_matches_column_flip(self, tmp_path):
        import sqlite3

        from neat_tpu.colmap_tools.database import (
            COLMAPDatabase,
            image_ids_to_pair_id,
        )

        db = COLMAPDatabase.connect(str(tmp_path / "m.db"))
        db.create_tables()
        m = np.asarray([[0, 5], [1, 6]], np.uint32)
        db.add_matches(2, 1, m)  # reversed ids: columns must swap
        db.commit()
        pair_id, rows, cols, blob = db.execute(
            "SELECT pair_id, rows, cols, data FROM matches"
        ).fetchone()
        db.close()
        assert pair_id == image_ids_to_pair_id(1, 2)
        stored = np.frombuffer(blob, np.uint32).reshape(rows, cols)
        np.testing.assert_array_equal(stored, m[:, ::-1])


def test_checkpoint_sweeper_prune(tmp_path, capsys):
    """tools/sweep.py (reference code/tools/sweep.py): prune keeps the
    newest N numbered checkpoints; dry-run touches nothing; 'latest'
    (non-numeric) survives."""
    import sys

    sys.path.insert(0, "tools")
    from sweep import sweep

    ck = tmp_path / "exp" / "2020" / "checkpoints"
    ck.mkdir(parents=True)
    for n in (100, 200, 300):
        (ck / f"{n}.ckpt").write_bytes(b"x")
    (ck / "latest.ckpt").write_bytes(b"x")

    sweep(str(tmp_path), prune_keep=2, dry_run=True)
    assert sorted(p.name for p in ck.iterdir()) == [
        "100.ckpt", "200.ckpt", "300.ckpt", "latest.ckpt",
    ]
    out = capsys.readouterr().out
    assert "would remove 100.ckpt" in out

    sweep(str(tmp_path), prune_keep=2, dry_run=False)
    assert sorted(p.name for p in ck.iterdir()) == [
        "200.ckpt", "300.ckpt", "latest.ckpt",
    ]
