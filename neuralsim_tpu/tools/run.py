"""Task chainer: run train,eval,... as one command.

TPU-native re-design of ``code_single/tools/run.py`` (reference, 132 LoC —
SURVEY.md §2.6): ``python -m neuralsim_tpu.tools.run train,eval,extract_mesh
--config ...`` executes the subtasks in order against one experiment dir.
"""
from __future__ import annotations

import sys

_TASKS = {
    "train": "neuralsim_tpu.tools.train",
    "train_multi": "neuralsim_tpu.tools.train_multi",
    "eval": "neuralsim_tpu.tools.eval",
    "eval_lidar": "neuralsim_tpu.tools.eval_lidar",
    "render": "neuralsim_tpu.tools.render",
    "extract_mesh": "neuralsim_tpu.tools.extract_mesh",
    "extract_occgrid": "neuralsim_tpu.tools.extract_occgrid",
    "extract_visible_grid": "neuralsim_tpu.tools.extract_visible_grid",
    "manipulate": "neuralsim_tpu.tools.manipulate",
    "visualize_slice": "neuralsim_tpu.tools.visualize_slice",
    "demo_category": "neuralsim_tpu.tools.demo_category",
    "inspect_rendering": "neuralsim_tpu.tools.inspect_rendering",
    "preprocess_waymo": "neuralsim_tpu.tools.preprocess_waymo",
    "viewer": "neuralsim_tpu.tools.viewer",
}


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv:
        print(f"usage: run <task[,task...]> [args]  — tasks: {list(_TASKS)}")
        return 1
    tasks = argv[0].split(",")
    rest = argv[1:]
    from ..utils.misc import import_str
    for t in tasks:
        if t not in _TASKS:
            raise SystemExit(f"unknown task {t!r}; known: {list(_TASKS)}")
        print(f"=== run: {t} ===", flush=True)
        import_str(_TASKS[t] + ".main")(rest)
    return 0


if __name__ == "__main__":
    sys.exit(main())
