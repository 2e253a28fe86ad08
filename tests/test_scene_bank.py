"""Scene bank: spec parsing, frame slicing, pickle roundtrip."""
import numpy as np

from neuralsim_tpu.dataio.synthetic_scene import SyntheticSceneDataset
from neuralsim_tpu.scene import create_scene_bank, load_scene_bank, parse_scene_spec


def test_parse_spec():
    assert parse_scene_spec("seg123") == ("seg123", 0, None)
    assert parse_scene_spec("seg123, 10, 50") == ("seg123", 10, 50)


def test_create_and_load_bank(tmp_path):
    ds = SyntheticSceneDataset(n_frames=8, H=16, W=16)
    scenes = create_scene_bank(ds, {"scenarios": ["synthetic_object, 2, 4"]},
                               exp_dir=str(tmp_path))
    assert len(scenes) == 1
    sc = scenes[0]
    assert sc.n_frames == 4
    # sliced transforms match the original range [2, 6)
    orig = ds.ds.c2ws[2:6]
    got = np.asarray(sc.observers["camera_0"].frame_data["transform"])
    np.testing.assert_allclose(got, orig, atol=1e-6)
    # reload from pickles
    scenes2 = load_scene_bank(str(tmp_path))
    assert scenes2[0].n_frames == 4
    np.testing.assert_allclose(
        np.asarray(scenes2[0].observers["camera_0"].frame_data["transform"]),
        orig, atol=1e-6)
