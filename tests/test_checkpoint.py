"""CheckpointIO: save/load roundtrip including tag resolution."""
import jax
import jax.numpy as jnp
import numpy as np

from neuralsim_tpu.utils.checkpoint import CheckpointIO


def _state():
    return {"params": {"w": jnp.arange(6.0).reshape(2, 3)},
            "it": jnp.asarray(7, jnp.int32)}


def test_step_save_and_load(tmp_path):
    io = CheckpointIO(str(tmp_path), keep_last=2, i_backup=0)
    s = _state()
    io.save(s, 100)
    io.save({**s, "it": jnp.asarray(200, jnp.int32)}, 200)
    out = io.load(jax.tree.map(jnp.zeros_like, s))
    assert int(out["it"]) == 200
    np.testing.assert_allclose(np.asarray(out["params"]["w"]),
                               np.arange(6.0).reshape(2, 3))


def test_tag_fallback_final(tmp_path):
    """'final'/'latest' tag dirs must be found when no step_* dirs exist —
    eval previously evaluated RANDOM params silently because of this."""
    io = CheckpointIO(str(tmp_path))
    s = _state()
    io.save(s, 100, tag="final")
    out = io.load(jax.tree.map(jnp.zeros_like, s))
    assert out is not None and int(out["it"]) == 7


def test_load_empty_returns_none(tmp_path):
    io = CheckpointIO(str(tmp_path))
    assert io.load(_state()) is None


def test_gc_keeps_last(tmp_path):
    io = CheckpointIO(str(tmp_path), keep_last=2, i_backup=0)
    for step in (1, 2, 3, 4):
        io.save(_state(), step)
    assert len(io.sorted_ckpts()) == 2
