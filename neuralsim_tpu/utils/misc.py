"""Generic containers and helpers.

TPU-native re-design of the generic plumbing that neuralsim pulls from
``nr3d_lib.utils`` (reference surface catalogued in SURVEY.md §2.9:
IDListedDict, import_str, collate_nested_dict, nested_dict_items, ...).
Implemented fresh for JAX pytrees.
"""
from __future__ import annotations

import importlib
from typing import Any, Callable, Dict, Iterator, List, Tuple, TypeVar

import numpy as np

T = TypeVar("T")


class IDListedDict(Dict[str, T]):
    """An ordered str-keyed dict that also supports integer / list indexing.

    Mirrors the access patterns the reference uses for node / observer
    registries (``scene.all_nodes[...]``): ``d[0]`` -> first value,
    ``d[['a','b']]`` -> list of values, iteration yields values in insertion
    order via ``.values()`` as usual.
    """

    def __getitem__(self, key):  # type: ignore[override]
        if isinstance(key, (int, np.integer)):
            return list(self.values())[key]
        if isinstance(key, (list, tuple)):
            return [self[k] for k in key]
        return super().__getitem__(key)

    def ids(self) -> List[str]:
        return list(self.keys())

    def to_list(self) -> List[T]:
        return list(self.values())


def import_str(string: str) -> Any:
    """Import a dotted path like ``pkg.mod.ClassName`` and return the attr.

    Same contract as the reference's config-driven class loading
    (``nr3d_lib.utils.import_str``, used throughout asset_bank/dataio).
    """
    module, _, name = string.rpartition(".")
    return getattr(importlib.import_module(module), name)


def nested_dict_items(d: Dict, prefix: Tuple[str, ...] = ()) -> Iterator[Tuple[Tuple[str, ...], Any]]:
    """Yield ``(key_path, leaf)`` for every leaf of a nested dict."""
    for k, v in d.items():
        if isinstance(v, dict):
            yield from nested_dict_items(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def zip_two_nested_dict(a: Dict, b: Dict) -> Iterator[Tuple[Tuple[str, ...], Any, Any]]:
    """Iterate matching leaves of two nested dicts with identical structure."""
    for path, va in nested_dict_items(a):
        vb = b
        for k in path:
            vb = vb[k]
        yield path, va, vb


def collate_nested_dict(items: List[Dict], stack_fn: Callable = None) -> Dict:
    """Stack a list of identically-structured nested dicts leaf-wise.

    The JAX analog of the reference's ``collate_nested_dict`` used by the
    dataloaders: leaves become arrays with a new leading batch dimension.
    """
    import jax.numpy as jnp

    if stack_fn is None:
        stack_fn = lambda xs: jnp.stack([jnp.asarray(x) for x in xs], axis=0)
    first = items[0]
    out: Dict = {}
    for k, v in first.items():
        if isinstance(v, dict):
            out[k] = collate_nested_dict([it[k] for it in items], stack_fn)
        else:
            out[k] = stack_fn([it[k] for it in items])
    return out


def to_device_tree(tree, device=None):
    """Move every array leaf of a pytree to a device (or default)."""
    import jax

    return jax.device_put(tree, device) if device is not None else jax.device_put(tree)


def tensor_statistics(x, prefix: str = "") -> Dict[str, float]:
    """Summary stats of an array, for logging (reference: stat_param hooks)."""
    x = np.asarray(x)
    if x.size == 0:
        return {}
    return {
        f"{prefix}mean": float(x.mean()),
        f"{prefix}std": float(x.std()),
        f"{prefix}min": float(x.min()),
        f"{prefix}max": float(x.max()),
        f"{prefix}absmax": float(np.abs(x).max()),
    }


def backup_codebase(exp_dir: str) -> str:
    """Zip the neuralsim_tpu package source into <exp_dir>/backup.zip so an
    experiment records the exact code it ran (reference code self-backup,
    code_single/tools/train.py:1230-1234)."""
    import os
    import zipfile
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(exp_dir, "backup.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, dirnames, filenames in os.walk(pkg_root):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in filenames:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full,
                                                  os.path.dirname(pkg_root)))
    return out


def set_eval_iteration(fields, it) -> None:
    """Stamp the checkpoint's training iteration onto field objects so
    it-driven schedules (inv_s mix anneal, cos anneal) evaluate at the
    sharpness the checkpoint actually reached, not at the assumed-complete
    final value (ADVICE r4: eval.py/render.py pass no ``it``; a mid-training
    checkpoint must not render at inv_s_final). ``fields`` is any iterable
    of model/field objects; objects without anneals simply ignore the
    attribute."""
    for f in fields:
        if f is not None:
            try:
                f.eval_it = int(it)
            except (TypeError, ValueError, AttributeError):
                pass
