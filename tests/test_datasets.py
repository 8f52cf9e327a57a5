"""Dataset loader tests: TUM / EuRoC / KITTI layouts on tiny tmp fixtures
(real datasets are absent in this environment, SURVEY §6.2) + viz smoke."""

import os

import numpy as np
import pytest

from tpuslam.io.datasets import (
    load_euroc,
    load_kitti,
    load_synthetic,
    load_tum,
    write_synthetic_dataset,
)


def _write_img(path):
    np.save(path, np.zeros((8, 8), np.uint8))


class TestTUM:
    def test_layout(self, tmp_path):
        root = tmp_path / "rgbd_dataset_freiburg1_xyz"
        (root / "rgb").mkdir(parents=True)
        lines = ["# comment"]
        for i in range(4):
            p = root / "rgb" / f"{i}.npy"
            _write_img(p)
            lines.append(f"13050314{i}.5 rgb/{i}.npy")
        (root / "rgb.txt").write_text("\n".join(lines))
        (root / "groundtruth.txt").write_text(
            "# ts tx ty tz qx qy qz qw\n"
            + "\n".join(f"13050314{i}.5 {i*0.1} 0 0 0 0 0 1" for i in range(4))
        )
        seq = load_tum(str(root))
        assert len(seq) == 4
        assert abs(seq.cam.fx - 517.3) < 1e-6  # fr1 intrinsics
        assert seq.gt_positions.shape == (4, 3)
        ts, img, right = next(iter(seq.frames()))
        assert right is None and img.shape == (8, 8)


class TestEuRoC:
    def test_layout(self, tmp_path):
        root = tmp_path / "MH_01_easy"
        for c in ("cam0", "cam1"):
            (root / "mav0" / c / "data").mkdir(parents=True)
            rows = ["#timestamp [ns],filename"]
            for i in range(3):
                ns = 1403636579763555584 + i * 50000000
                p = root / "mav0" / c / "data" / f"{ns}.npy"
                _write_img(p)
                rows.append(f"{ns},{ns}.npy")
            (root / "mav0" / c / "data.csv").write_text("\n".join(rows))
        gdir = root / "mav0" / "state_groundtruth_estimate0"
        gdir.mkdir(parents=True)
        rows = ["#timestamp, p_RS_R_x [m], p_RS_R_y [m], p_RS_R_z [m]"]
        for i in range(3):
            ns = 1403636579763555584 + i * 50000000
            rows.append(f"{ns},{i*0.1},0.0,0.0")
        (gdir / "data.csv").write_text("\n".join(rows))
        seq = load_euroc(str(root))
        assert len(seq) == 3
        assert seq.cam.baseline > 0.1
        ts, left, right = next(iter(seq.frames()))
        assert right is not None


class TestKITTI:
    def test_layout(self, tmp_path):
        base = tmp_path / "sequences" / "00"
        for c in ("image_0", "image_1"):
            (base / c).mkdir(parents=True)
            for i in range(3):
                _write_img(base / c / f"{i:06d}.npy")
        # loader builds .png paths; patch by writing times + renaming ext
        (base / "times.txt").write_text("0.0\n0.1\n0.2\n")
        (tmp_path / "poses").mkdir()
        mats = np.tile(np.eye(4)[:3].reshape(1, 12), (3, 1))
        mats[:, 3] = [0.0, 0.5, 1.0]
        np.savetxt(tmp_path / "poses" / "00.txt", mats)
        seq = load_kitti(str(tmp_path), "00")
        assert len(seq) == 3
        assert seq.gt_poses.shape == (3, 4, 4)
        assert np.allclose(seq.gt_positions[:, 0], [0.0, 0.5, 1.0])
        assert seq.cam.width == 1241


class TestSyntheticDataset:
    def test_roundtrip(self, tmp_path):
        write_synthetic_dataset(str(tmp_path / "ds"), n_frames=3, n_segments=30)
        seq = load_synthetic(str(tmp_path / "ds"))
        assert len(seq) == 3
        assert seq.cam.baseline > 0
        ts, left, right = next(iter(seq.frames()))
        assert left.shape == (480, 640)
        assert right is not None
        assert seq.gt_poses.shape[0] == 3


class TestViz:
    def test_plots(self, tmp_path, rng):
        from tpuslam.io.synthetic import make_wireframe_scene, synthetic_frame_features
        from tpuslam.slammap.map import SlamMap
        from tpuslam.viz import draw_frame_overlay, plot_map, plot_trajectory

        pos = rng.normal(size=(20, 3)).cumsum(axis=0)
        p1 = plot_trajectory(pos, pos + 0.01, str(tmp_path / "t.png"))
        assert os.path.getsize(p1) > 1000

        from tpuslam.geometry import Intrinsics

        cam = Intrinsics(fx=458.0, fy=457.0, cx=320.0, cy=240.0, baseline=0.11)
        scene = make_wireframe_scene(rng, n_segments=40, n_frames=2, cam=cam)
        m = SlamMap()
        feats, _ = synthetic_frame_features(scene, 0, with_depth=True)
        kf = m.new_keyframe(0, 0.0, scene.poses[0], feats)
        for s in range(5):
            lid = m.lines.allocate(np.zeros(6), scene.segments[s], np.zeros(8, np.uint32), 0)
            m.lines.add_observation(lid, kf, s)
        p2 = plot_map(m, str(tmp_path / "m.png"))
        assert os.path.getsize(p2) > 1000
        p3 = draw_frame_overlay(
            np.zeros((480, 640), np.float32), feats, np.arange(3), str(tmp_path / "f.png")
        )
        assert os.path.getsize(p3) > 1000
