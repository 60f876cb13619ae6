import numpy as np

from neuralrecon_w_tpu.datasets import colmap


def test_colmap_roundtrip(tmp_path):
    cams = {
        1: colmap.Camera(1, "PINHOLE", 640, 480, np.array([500.0, 500.0, 320.0, 240.0])),
        2: colmap.Camera(2, "SIMPLE_RADIAL", 800, 600, np.array([600.0, 400.0, 300.0, 0.01])),
    }
    colmap.write_cameras_binary(cams, str(tmp_path / "cameras.bin"))
    cams2 = colmap.read_cameras_binary(str(tmp_path / "cameras.bin"))
    assert cams2[1].model == "PINHOLE"
    np.testing.assert_allclose(cams2[2].params, cams[2].params)
    assert cams2[2].width == 800

    rng = np.random.RandomState(0)
    imgs = {
        7: colmap.Image(
            7,
            np.array([1.0, 0, 0, 0]),
            np.array([0.1, 0.2, 0.3]),
            1,
            "photo_001.jpg",
            rng.rand(5, 2) * 100,
            np.array([3, -1, 4, -1, 5], dtype=np.int64),
        )
    }
    colmap.write_images_binary(imgs, str(tmp_path / "images.bin"))
    imgs2 = colmap.read_images_binary(str(tmp_path / "images.bin"))
    assert imgs2[7].name == "photo_001.jpg"
    np.testing.assert_allclose(imgs2[7].xys, imgs[7].xys)
    np.testing.assert_array_equal(imgs2[7].point3D_ids, imgs[7].point3D_ids)

    pts = {
        3: colmap.Point3D(
            3,
            np.array([1.0, 2.0, 3.0]),
            np.array([255, 128, 0], np.uint8),
            0.5,
            np.array([7, 7]),
            np.array([0, 2]),
        )
    }
    colmap.write_points3d_binary(pts, str(tmp_path / "points3D.bin"))
    pts2 = colmap.read_points3d_binary(str(tmp_path / "points3D.bin"))
    np.testing.assert_allclose(pts2[3].xyz, pts[3].xyz)
    assert pts2[3].error == 0.5
    np.testing.assert_array_equal(pts2[3].image_ids, [7, 7])


def test_qvec_rotmat_roundtrip():
    rng = np.random.RandomState(1)
    for _ in range(10):
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        R = colmap.qvec2rotmat(q)
        assert np.allclose(R @ R.T, np.eye(3), atol=1e-10)
        q2 = colmap.rotmat2qvec(R)
        assert np.allclose(q2, q, atol=1e-8)


def test_points3d_arrays():
    pts = {
        2: colmap.Point3D(2, np.array([1.0, 1, 1]), np.zeros(3, np.uint8), 0.25,
                          np.array([1]), np.array([0])),
        5: colmap.Point3D(5, np.array([2.0, 2, 2]), np.zeros(3, np.uint8), 0.75,
                          np.array([1, 2, 3]), np.array([0, 1, 2])),
    }
    xyz, err, track = colmap.points3d_arrays(pts)
    assert xyz.shape == (6, 3)
    np.testing.assert_allclose(xyz[5], [2, 2, 2])
    assert err[2] == 0.25
    assert track[5] == 3 and track[0] == 0
