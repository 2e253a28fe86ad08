"""Config system: YAML + ${...} interpolation + ${eval:"..."} + CLI dot-overrides.

TPU-native re-implementation of the reference's config surface
(``nr3d_lib.config`` — SURVEY.md §2.8: BaseConfig argparse+YAML merge,
ConfigDict, load_config/save_config, OmegaConf-style interpolation visible
throughout e.g. withmask_withlidar_joint.240219.yaml:38,163, dot-overrides
``--aaa.bbb=ccc`` per code_single/README.md:74-76). omegaconf is not in this
image, so interpolation is implemented here directly.
"""
from .config import (ConfigDict, load_config, save_config, parse_cli_overrides,
                     resolve_interpolations, BaseConfig)

__all__ = ["ConfigDict", "load_config", "save_config", "parse_cli_overrides",
           "resolve_interpolations", "BaseConfig"]
