"""Directory batch runners: apply tasks across many experiment dirs, or
train+eval a list of configs.

TPU-native re-design of the reference's operational batch scripts
(``code_single/tools/eval_directory.py``, ``train_and_eval_multiple`` —
SURVEY.md §2.6 directory-runner row). Two modes::

    # every <root>/*/config.yaml gets the task chain run against it
    python -m neuralsim_tpu.tools.run_directory --root logs/batch \\
        --tasks eval,extract_mesh [--platform=cpu] [extra overrides...]

    # train each config, then eval it (train_and_eval_multiple)
    python -m neuralsim_tpu.tools.run_directory \\
        --configs cfg_a.yaml,cfg_b.yaml --tasks train,eval \\
        --exp_root logs/batch
"""
from __future__ import annotations

import argparse
import os
import sys
import traceback
from typing import Dict, List


def _run_tasks(tasks: List[str], args: List[str]) -> bool:
    from .run import main as run_main
    try:
        run_main([",".join(tasks)] + args)
        return True
    except SystemExit as e:
        return not e.code
    except Exception:
        traceback.print_exc()
        return False


def main(argv=None):
    p = argparse.ArgumentParser("neuralsim_tpu directory runner",
                                allow_abbrev=False)
    p.add_argument("--root", default=None,
                   help="directory of experiment dirs (each with config.yaml)")
    p.add_argument("--configs", default=None,
                   help="comma-separated config files to train+eval")
    p.add_argument("--tasks", default="eval",
                   help="comma-separated task chain per entry")
    p.add_argument("--exp_root", default="logs/batch",
                   help="with --configs: root for per-config exp dirs")
    args, extra = p.parse_known_args(argv)
    tasks = args.tasks.split(",")

    entries = []
    if args.root:
        for d in sorted(os.listdir(args.root)):
            exp = os.path.join(args.root, d)
            cfg = os.path.join(exp, "config.yaml")
            if os.path.isfile(cfg):
                entries.append((d, ["--config", cfg, f"--exp_dir={exp}",
                                    f"--resume_dir={exp}"] + extra))
    elif args.configs:
        for cfg in args.configs.split(","):
            name = os.path.splitext(os.path.basename(cfg))[0]
            exp = os.path.join(args.exp_root, name)
            entries.append((name, ["--config", cfg, f"--exp_dir={exp}"] + extra))
    else:
        p.error("one of --root / --configs is required")

    results: Dict[str, bool] = {}
    for name, task_args in entries:
        print(f"===== [{name}] {','.join(tasks)} =====", flush=True)
        results[name] = _run_tasks(tasks, task_args)
    print("\nsummary:")
    for name, ok in results.items():
        print(f"  {'ok  ' if ok else 'FAIL'} {name}")
    return 0 if all(results.values()) else 1


if __name__ == "__main__":
    sys.exit(main())
