"""render.py r2 additions: street_view path, video assembly, mesh overlay
(reference code_single/tools/render.py:485-521 + post-render assembly)."""
import os

import numpy as np

from neuralsim_tpu.tools.render import (assemble_video, get_path_street_view,
                                        overlay_mesh)


def test_street_view_path_offsets_and_pitch():
    T = 6
    c2ws = np.tile(np.eye(4), (T, 1, 1))
    c2ws[:, 0, 3] = np.arange(T, dtype=float)   # translate along +x
    poses = get_path_street_view(c2ws, 4, shift_l=2.0, shift_v=1.0,
                                 pitch_deg=15.0)
    assert poses.shape == (4, 4, 4)
    # identity rotation: right = +x, up(-y) = shift -(-1)... position offset
    # is +2 along cam-x and -1 along cam-y from the interpolated base
    base = c2ws[0]
    np.testing.assert_allclose(poses[0][:3, 3] - [0, -1, 0] - [2, 0, 0],
                               base[:3, 3], atol=0.5)
    # rotations stay orthonormal after the pitch
    for P in poses:
        R = P[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
    # pitched down: forward axis gained a +y (down) component
    assert poses[0][1, 2] > 0.1


def test_assemble_video_writes_gif_or_mp4(tmp_path):
    from PIL import Image
    for i in range(3):
        Image.fromarray(np.full((16, 16, 3), i * 60, np.uint8)).save(
            tmp_path / f"rgb_{i:04d}.png")
    out = assemble_video(str(tmp_path), "rgb_", fps=5)
    assert out is not None and os.path.isfile(out)
    assert out.endswith((".mp4", ".gif"))


def test_overlay_mesh_draws_in_front_only():
    H, W = 32, 32
    rgb = np.zeros((H, W, 3), np.float32)
    depth = np.full((H, W), 10.0, np.float32)
    intr = np.array([[32.0, 0, 16.0], [0, 32.0, 16.0], [0, 0, 1]])
    c2w = np.eye(4)
    # one triangle 2m in front of the camera (visible), one behind (culled)
    verts = np.array([[-0.2, -0.2, 2.0], [0.2, -0.2, 2.0], [0.0, 0.2, 2.0],
                      [-0.2, -0.2, -2.0], [0.2, -0.2, -2.0], [0.0, 0.2, -2.0]],
                     np.float32)
    faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    out = overlay_mesh(rgb, depth, verts, faces, intr, c2w, alpha=1.0)
    assert out.sum() > 0, "front triangle not drawn"
    # occluded case: rendered surface at 1m hides the 2m mesh
    out2 = overlay_mesh(rgb, np.full((H, W), 1.0, np.float32), verts, faces,
                        intr, c2w, alpha=1.0)
    assert out2.sum() == 0.0, "mesh drawn through nearer rendered geometry"
