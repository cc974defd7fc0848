"""Small infra utilities: typed env parsing, singletons, enums, exceptions.

Consolidates the reference's long tail of tiny modules
(roar/utils/env_var_parsing.py, metaclasses.py, enum.py, exceptions.py,
data_utils.py resolve_cache_dir/is_tarred_path, config_utils.py
assert_dataclass_signature_match) into one module.  The AIStore/datastore
machinery of data_utils.py is cloud-cluster plumbing with no TPU analogue
and is intentionally absent; `roar_tpu/utils/cloud.py` handles artifact
caching.
"""

from __future__ import annotations

import dataclasses
import enum
import inspect
import json
import os
import pathlib
from typing import Any, Callable, Dict, List, Optional, Tuple


# ---- env var parsing (env_var_parsing.py:22-166) -----------------------


class CoercionError(Exception):
    def __init__(self, key: str, value: Any, func: Callable):
        super().__init__(f"Unable to coerce env var {key}={value!r} with {func}")


class RequiredSettingMissingError(Exception):
    def __init__(self, key: str):
        super().__init__(f"Required env var {key!r} is missing")


def _get_env(key: str, default=None, coerce: Callable = lambda x: x,
             required: bool = False):
    try:
        value = os.environ[key]
    except KeyError:
        if required:
            raise RequiredSettingMissingError(key) from None
        return default
    try:
        return coerce(value)
    except Exception:
        raise CoercionError(key, value, coerce) from None


def _coerce_bool(value: str) -> bool:
    return value.strip().lower() in ("true", "1", "y", "yes", "on")


def get_env(key: str, *default, **kwargs):
    """String env var; raises RequiredSettingMissingError without default."""
    assert len(default) in (0, 1), "too many default args"
    if not default:
        return _get_env(key, required=True, **kwargs)
    return _get_env(key, default[0], **kwargs)


def get_envbool(key: str, *default):
    return get_env(key, *default, coerce=_coerce_bool)


def get_envint(key: str, *default):
    return get_env(key, *default, coerce=int)


def get_envfloat(key: str, *default):
    return get_env(key, *default, coerce=float)


def get_envdict(key: str, *default) -> Dict:
    return get_env(key, *default, coerce=json.loads)


# ---- metaclasses / enum (metaclasses.py:1-24, enum.py:1-26) ------------


class Singleton(type):
    """Metaclass: one instance per class (AppState-style)."""

    _instances: Dict[type, Any] = {}

    def __call__(cls, *args, **kwargs):
        if cls not in cls._instances:
            cls._instances[cls] = super().__call__(*args, **kwargs)
        return cls._instances[cls]


class PrettyStrEnum(enum.Enum):
    """String-valued enum whose str() is the value and whose constructor
    gives a readable error listing the options."""

    def __str__(self) -> str:
        return str(self.value)

    @classmethod
    def _missing_(cls, value):
        choices = ", ".join(str(m.value) for m in cls)
        raise ValueError(f"{value!r} is not a valid {cls.__name__}; choose from: {choices}")


# ---- exceptions (exceptions.py:1-22) -----------------------------------


class RoarTPUBaseException(Exception):
    """Base class for framework exceptions."""


class CheckInstall:
    """Placeholder object for an uninstalled optional dependency: any
    construction/call/attribute access raises with an install hint."""

    def __init__(self, *args, **kwargs):
        pass

    def _raise(self):
        raise RoarTPUBaseException(
            f"{type(self).__name__} requires an optional dependency that is "
            "not installed in this environment"
        )

    def __call__(self, *args, **kwargs):
        self._raise()

    def __getattr__(self, name):
        self._raise()


# ---- data utils (data_utils.py:12-43) ----------------------------------


def resolve_cache_dir() -> pathlib.Path:
    """Framework cache dir: $ROAR_TPU_CACHE_DIR or ~/.cache/roar_tpu."""
    override = os.environ.get("ROAR_TPU_CACHE_DIR") or os.environ.get("ROAR_CACHE_DIR")
    if override:
        return pathlib.Path(override).expanduser()
    return pathlib.Path.home() / ".cache" / "roar_tpu"


def is_tarred_path(path: str) -> bool:
    return str(path).endswith((".tar", ".tar.gz", ".tgz"))


# ---- config utils (config_utils.py assert_dataclass_signature_match) ---


def assert_dataclass_signature_match(
    cls: type,
    datacls: type,
    ignore_args: Optional[List[str]] = None,
) -> Tuple[bool, List[str], List[str]]:
    """Compare a class __init__ signature against a config dataclass's
    fields; returns (matches, cls_only_args, dataclass_only_args).  Used to
    keep `*Config` dataclasses in sync with the modules they configure."""
    ignore = {"self", "args", "kwargs", *(ignore_args or [])}
    sig = inspect.signature(cls.__init__)
    cls_args = {p for p in sig.parameters if p not in ignore}
    dc_args = {f.name for f in dataclasses.fields(datacls)} - ignore
    cls_only = sorted(cls_args - dc_args)
    dc_only = sorted(dc_args - cls_args)
    return (not cls_only and not dc_only), cls_only, dc_only
