"""YAML config system with `_target_` instantiation.

A lean re-design of the reference's Hydra/OmegaConf layer
(roar/core/config/hydra_runner.py:37-122, hydra.utils.instantiate usage in
models/fastpitch.py:130-141): YAML configs with `${dotted.path}`
interpolation, CLI dotlist overrides (`a.b.c=value`), and recursive
`_target_` class-path instantiation — without the Hydra dependency (not in
the image).
"""

from roar_tpu.config.config import (  # noqa: F401
    MISSING,
    ConfigError,
    import_class_by_path,
    instantiate,
    load_config,
    merge,
    resolve_interpolations,
    to_yaml,
)
